from .normalize import (  # noqa: F401
    normalize_mention,
    strip_accents,
    bracket_parts,
    entity_name,
    norm_edit_similarity,
    token_jaccard,
    lexical_score,
)
