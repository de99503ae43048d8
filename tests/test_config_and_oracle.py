"""Pure-function unit tier (SURVEY §5.4): config parsing/validation
(reference AwsConfigSpec analog), analyzer contract across all three
implementations, BM25 formula vs hand-computed values."""

from __future__ import annotations

import json
import math

import pytest

from oracle.bm25 import OracleIndex, tokenize as oracle_tokenize
from snowplow_elasticsearch_loader_spark.config import DEFAULT_CONFIG, EngineConfig
from snowplow_elasticsearch_loader_spark.functions.analyze import (
    tokenize_text,
    tokens_col,
)


def test_config_defaults_and_layering(tmp_path):
    cfg = EngineConfig.from_dict({"bm25": {"k1": 0.9}, "index": {"block_size": 64}})
    assert cfg.bm25.k1 == 0.9 and cfg.bm25.b == 0.75  # layered defaults
    assert cfg.index.block_size == 64
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"limits": {"max_text_bytes": 123456}}))
    cfg2 = EngineConfig.from_json(str(p))
    assert cfg2.limits.max_text_bytes == 123456
    assert cfg2.bm25.k1 == 1.2


def test_config_rejects_unknown_and_invalid():
    with pytest.raises(ValueError, match="unknown config keys"):
        EngineConfig.from_dict({"bm25": {"k9": 1.0}})
    with pytest.raises(ValueError, match="k1>0"):
        EngineConfig.from_dict({"bm25": {"k1": -1.0}}).validate()
    with pytest.raises(ValueError, match="block_size"):
        EngineConfig.from_dict({"index": {"block_size": 1}}).validate()


TRICKY = [
    "Hello Wörld ÜÖÄ",
    "my-app-üöä e-mail v2.0",
    "你好 世界 🙂 mixed ASCII",
    "",
    "   ",
    "UPPER lower MiXeD",
    "under_score snake_case",  # _ excluded from tokens
    "numbers 42 and 3rd things",
]


@pytest.mark.parametrize("text", TRICKY)
def test_tokenizer_python_matches_oracle(text):
    assert tokenize_text(text) == oracle_tokenize(text)


def test_tokenizer_spark_matches_python(spark):
    df = spark.createDataFrame([(t,) for t in TRICKY], "text string")
    got = [r[0] for r in df.select(tokens_col("text")).collect()]
    assert got == [tokenize_text(t) for t in TRICKY]


def test_bm25_formula_hand_computed():
    # corpus: d0="a b a", d1="b c", d2="c c c c"
    idx = OracleIndex([(0, "a b a"), (1, "b c"), (2, "c c c c")])
    assert idx.n_docs == 3 and idx.avgdl == 3.0
    # query "a": df=1, idf=ln(1+(3-1+0.5)/1.5)=ln(8/3)
    idf_a = math.log(1 + (3 - 1 + 0.5) / 1.5)
    tf, dl = 2.0, 3.0
    expected = idf_a * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0))
    res = idx.search("a", k=3)
    assert res == [(1, 0, round(expected, 6))]
    # duplicate query term doubles the weight
    res2 = idx.search("a a", k=3)
    assert res2[0][2] == round(2 * expected, 6)
    # absent term -> empty
    assert idx.search("zzz") == []


def test_default_config_is_lucene_defaults():
    assert DEFAULT_CONFIG.bm25.k1 == 1.2 and DEFAULT_CONFIG.bm25.b == 0.75
