"""Unit tests for the normalization / scoring cores (SURVEY.md §2.2)."""

from tabular_data_semantics_py_spark.functions.normalize import (
    bracket_parts,
    entity_name,
    lexical_score,
    norm_edit_similarity,
    normalize_mention,
    strip_accents,
    token_jaccard,
)


def test_strip_accents():
    # oaei/dbpedia_fragment.py:72-78 semantics
    assert strip_accents("São Paulo") == "Sao Paulo"
    assert strip_accents("Zürich") == "Zurich"
    assert strip_accents("Dončić") == "Doncic"
    assert strip_accents("plain") == "plain"


def test_bracket_parts():
    # kg/dbpedia.py:22-31: >2-char parenthesized groups
    assert bracket_parts("Paris (Texas)") == ["Texas"]
    assert bracket_parts("A (bb) (ccc)") == ["ccc"]  # 'bb' too short
    assert bracket_parts("nothing here") == []


def test_normalize_mention():
    assert normalize_mention('"Paris"') == "paris"  # challenge_utils.py:664-666
    assert normalize_mention("Paris (Texas)") == "paris"
    assert normalize_mention("  São   Paulo ") == "sao paulo"
    assert normalize_mention(None) == ""
    assert normalize_mention("") == ""


def test_entity_name():
    # util/utilities.py:44-63
    assert entity_name("http://x.org/resource/Foo_Bar") == "Foo_Bar"
    assert entity_name("http://x.org/onto#Thing") == "Thing"
    assert entity_name("http://x.org/a/b/") == "b"


def test_edit_similarity_bounds():
    assert norm_edit_similarity("abc", "abc") == 1.0
    assert norm_edit_similarity("abc", "xyz") == 0.0
    assert 0 < norm_edit_similarity("paris", "pariss") < 1


def test_token_jaccard():
    assert token_jaccard("a b", "a b") == 1.0
    assert token_jaccard("a b", "b c") == 1 / 3
    assert token_jaccard("", "") == 1.0


def test_lexical_score_monotone():
    near = lexical_score("michael jordan", "michael jordon")
    far = lexical_score("michael jordan", "midnight echoes")
    # near: edit_sim ~0.93, token jaccard 1/3 → ~0.63; far ≈ 0
    assert near > 0.6 > far
    assert lexical_score("paris", "paris") == 1.0
