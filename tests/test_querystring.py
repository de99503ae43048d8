"""simple_query_string parser unit tests (pure Python — the Spark/
oracle agreement for q_query_string_topk itself is covered by the
parametrized oracle gate in test_entry_contract.py)."""

from __future__ import annotations

from snowplow_elasticsearch_loader_spark.operators.querystring import (
    parse_query_string,
)


def test_bare_terms_are_should():
    p = parse_query_string("merge sort window")
    assert p.should == ["merge", "sort", "window"]
    assert p.must == [] and p.must_not == [] and p.phrases == []
    assert p.scored_terms == ["merge", "sort", "window"]


def test_plus_minus_operators():
    p = parse_query_string("+customer filter -dup -slow")
    assert p.must == ["customer"]
    assert p.should == ["filter"]
    assert p.must_not == ["dup", "slow"]
    # must_not terms never score
    assert "dup" not in p.scored_terms and "slow" not in p.scored_terms
    assert sorted(p.scored_terms) == ["customer", "filter"]


def test_quoted_phrase_is_analyzed_and_scored():
    p = parse_query_string('"Hash JOIN" order')
    assert p.phrases == [["hash", "join"]]
    assert p.should == ["order"]
    assert p.scored_terms == ["hash", "join", "order"]


def test_single_token_phrase_degrades_to_term():
    p = parse_query_string('"vector" -"dup"')
    assert p.phrases == []
    assert p.should == ["vector"]
    assert p.must_not == ["dup"]


def test_multi_token_bare_chunk_splits_on_analyzer():
    # the analyzer, not whitespace, defines term boundaries
    p = parse_query_string("re-index +a.b")
    assert p.should == ["re", "index"]
    assert p.must == ["a", "b"]


def test_lenient_empty_chunks_dropped():
    p = parse_query_string('... "" +?! -')
    assert p.should == [] and p.must == [] and p.must_not == []
    assert p.phrases == [] and p.scored_terms == []


def test_qtf_multiplicity():
    p = parse_query_string("spark batch spark")
    assert p.scored_terms.count("spark") == 2
