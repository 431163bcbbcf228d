"""microhh_tpu: TPU-native DNS/LES framework for atmospheric boundary-layer
turbulence, a ground-up JAX/Pallas re-design with the capabilities of the
reference C++/CUDA framework (adconnolly/microhh)."""

__version__ = "0.1.0"

from .config import Ini
from .grid import Grid
from .fields import Fields
from .timeloop import Timeloop
from .model import Model, run_case
