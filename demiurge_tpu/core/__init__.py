from .grid import Grid
from .state import State, new_state
from . import topology, stencils

__all__ = ["Grid", "State", "new_state", "topology", "stencils"]
