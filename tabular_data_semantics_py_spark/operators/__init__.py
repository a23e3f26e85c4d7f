from .closure import build_closure  # noqa: F401
from .candidates import build_index_keys, generate_candidates  # noqa: F401
from .types_cascade import build_entity_types  # noqa: F401
from .annotate import cea, cta, cpa  # noqa: F401
from .emit import emit_triples  # noqa: F401
