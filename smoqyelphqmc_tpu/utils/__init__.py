from .pytree import static_field, register_pytree_dataclass

__all__ = ["static_field", "register_pytree_dataclass"]
