from .dedup_facade import TIERS, dedup
from .cleaning import (
    dedup_keep_min,
    null_audit,
    recode_enum,
    sentinel_audit,
)
from .hours import parse_hours_range
from .maps import explode_map_entries, parse_dict_literal
from .scalar import with_global_max
from .star import star_join
from .windows import top_k_per_group

__all__ = [
    "dedup",
    "TIERS",
    "dedup_keep_min",
    "null_audit",
    "recode_enum",
    "sentinel_audit",
    "parse_hours_range",
    "explode_map_entries",
    "parse_dict_literal",
    "with_global_max",
    "star_join",
    "top_k_per_group",
]
