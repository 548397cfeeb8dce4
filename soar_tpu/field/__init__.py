from .hashgrid import HashGridConfig, hash_encode, init_hash_grid  # noqa: F401
from .attribute_field import (  # noqa: F401
    AttributeFieldConfig,
    init_attribute_field,
    attribute_field_apply,
    reset_field,
)
