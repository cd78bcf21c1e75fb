from .containers import ArrayAndTime, get_array, get_scalar
from .struct import field, pytree_dataclass, replace

__all__ = [
    "ArrayAndTime",
    "get_array",
    "get_scalar",
    "field",
    "pytree_dataclass",
    "replace",
]
