from .transforms import (  # noqa: F401
    add_fields,
    compose,
    emitted_at,
    flatten_json,
    hash_id,
    normalize_name,
    record_filter,
    remove_fields,
)
from .normalize import TypeCoercer, type_transform  # noqa: F401
