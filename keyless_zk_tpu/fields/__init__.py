from . import bn254, jax_field, limbs  # noqa: F401
from .jax_field import FQ, FR, FieldSpec  # noqa: F401
