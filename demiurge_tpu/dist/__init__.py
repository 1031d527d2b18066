from .mesh import (
    choose_mesh_shape,
    field_sharding,
    initialize,
    make_mesh,
    replicated,
    shard_field,
    sharded_jit,
)

__all__ = [
    "choose_mesh_shape",
    "field_sharding",
    "initialize",
    "make_mesh",
    "replicated",
    "shard_field",
    "sharded_jit",
]
