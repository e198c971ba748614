from .clean import (
    conditional_cast,
    digits_only,
    normalize_headers,
    parse_date,
    phone_normalize,
    stringify_legacy,
    with_defaults,
)
from .dedup import dedup_arbitrary, dedup_deterministic
from .edit_distance import levenshtein_pairs_blocked
from .ids import surrogate_ids
from .joins import fk_lookup, new_rows
from .quality import validate_split
from .reshape import extract_dimension, unpivot

__all__ = [
    "conditional_cast",
    "digits_only",
    "normalize_headers",
    "parse_date",
    "phone_normalize",
    "stringify_legacy",
    "with_defaults",
    "dedup_arbitrary",
    "dedup_deterministic",
    "levenshtein_pairs_blocked",
    "surrogate_ids",
    "fk_lookup",
    "new_rows",
    "validate_split",
    "extract_dimension",
    "unpivot",
]
