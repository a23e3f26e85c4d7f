from .generator import FixtureCorpus, make_corpus  # noqa: F401
