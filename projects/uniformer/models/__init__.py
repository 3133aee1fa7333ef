from .uniformer import UniFormer  # noqa: F401
