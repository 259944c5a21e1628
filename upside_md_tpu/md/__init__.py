from .integrator import integration_cycle, recenter  # noqa: F401
from .thermostat import OUThermostat  # noqa: F401
from .sim import Simulation, SimState  # noqa: F401
