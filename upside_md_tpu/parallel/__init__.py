from .mesh import (make_replica_mesh, shard_replica_state,  # noqa: F401
                   sharded_advance, training_step)
