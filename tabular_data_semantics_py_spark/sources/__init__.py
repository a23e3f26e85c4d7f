from .repo_source import (  # noqa: F401
    REPO_SCHEMA,
    corpus_to_dataframes,
    discover_csv_artifacts,
)
from .csv_cells import parse_cells  # noqa: F401
