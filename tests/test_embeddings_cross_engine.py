"""Cross-engine embedding parity on ADVERSARIAL corpora.

The round-4 ADVICE flagged the hashed-embedding oracle as fragile on
exotic input: full-Unicode lower() differs between Python and
DuckDB/ICU (İ, Σ, ß...), and summation order can flip the 6dp
rounding boundary. The round-5 spec pins ASCII-only case folding
(translate A-Z on both engines) and an exact norm (integer counts,
fsum). This test drives the ACTUAL Python kernel and the ACTUAL
DuckDB twin over corpora the driver fixtures never contain — Turkish
dotted-İ, final sigma, sharp s, combining marks, non-break spaces,
mixed CJK — and requires value-identical 6dp components.
"""

import duckdb
import pytest

from coa_codesearch_mcp_spark.functions.embeddings import _embed_series

DIM = 16

# the DuckDB side of the spec, verbatim shape of the driver oracle
# (__spark_entry__.oracle_sql()['text_hash_embeddings'])
_SQL = r"""
WITH ids AS (SELECT * FROM (VALUES {values}) AS v(doc_id, text)),
tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(
                  translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                                  'abcdefghijklmnopqrstuvwxyz'),
                  '[ \t\n\f\r]+'),
                x -> x <> '')) AS term
  FROM ids
),
h AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(term), 1, 8) AS BIGINT) % {dim} AS bucket,
         CASE WHEN CAST('0x' || substr(md5(term), 9, 1) AS INT) % 2 = 0
              THEN 1.0 ELSE -1.0 END AS sign
  FROM tok
),
sums AS (SELECT doc_id, bucket, sum(sign) AS v FROM h GROUP BY 1, 2),
dense AS (
  SELECT i.doc_id, b.b AS bucket, coalesce(s.v, 0.0) AS v
  FROM (SELECT DISTINCT doc_id FROM ids) i
  CROSS JOIN range(0, {dim}) b(b)
  LEFT JOIN sums s ON s.doc_id = i.doc_id AND s.bucket = b.b
),
norms AS (SELECT doc_id, sqrt(sum(v * v)) AS n FROM dense GROUP BY 1)
SELECT d.doc_id, d.bucket,
       round(CASE WHEN n.n > 0 THEN d.v / n.n ELSE 0.0 END, 6) AS value
FROM dense d JOIN norms n USING (doc_id)
ORDER BY d.doc_id, d.bucket
"""

ADVERSARIAL = [
    "İstanbul KAYIK kayık İİİ",                 # Turkish dotted İ (full lower() -> i̇ + combining dot)
    "ΟΔΥΣΣΕΥΣ οδυσσευς ΤΕΛΟΣ",                  # Greek incl. would-be final sigma
    "STRASSE straße GROSS groß",                # sharp s (upper('ß') roundtrip differs)
    "Café CAFÉ noël",          # combining marks next to folded A-Z
    "non breaking space stays one token",  # NBSP not in the \s class
    "ＦＵＬＬＷＩＤＴＨ Ｌａｔｉｎ ｍｉｘ",        # fullwidth Latin (not A-Z)
    "汉字 と かな MIXED with Ascii",
    "tabs\tand\nnewlines\fand\rreturns split",
    "",                                          # empty -> zero vector
    "ALLCAPS",                                   # single token, pure A-Z fold
]


@pytest.mark.parametrize("batch", [ADVERSARIAL])
def test_python_kernel_matches_duckdb_twin_on_adversarial_text(batch):
    import pandas as pd

    spark_side = _embed_series(pd.Series(batch), DIM, 6)

    def q(s):
        return "'" + s.replace("'", "''") + "'"

    values = ", ".join(f"({i}, {q(t)})" for i, t in enumerate(batch))
    rows = duckdb.sql(_SQL.format(values=values, dim=DIM)).fetchall()
    duck = {}
    for doc_id, bucket, value in rows:
        duck.setdefault(int(doc_id), [0.0] * DIM)[int(bucket)] = float(value)

    for i, vec in enumerate(spark_side):
        assert len(vec) == DIM
        assert vec == pytest.approx(duck[i], abs=0.0), (
            f"doc {i} ({batch[i]!r}): python {vec} != duckdb {duck[i]}"
        )


def test_random_unicode_fuzz_matches():
    """Seeded fuzz over a unicode-heavy alphabet: every generated text
    must embed identically on both engines (the property the oracle's
    hash gate relies on, checked beyond the fixtures)."""
    import random

    import pandas as pd

    rng = random.Random(20260817)
    alphabet = (
        "abcXYZ0129_-.;ÀÉİßσΣ汉字かなＡＢ   \t\n"
    )
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 60)))
        for _ in range(80)
    ]
    spark_side = _embed_series(pd.Series(texts), DIM, 6)

    def q(s):
        return "'" + s.replace("'", "''") + "'"

    values = ", ".join(f"({i}, {q(t)})" for i, t in enumerate(texts))
    rows = duckdb.sql(_SQL.format(values=values, dim=DIM)).fetchall()
    duck = {}
    for doc_id, bucket, value in rows:
        duck.setdefault(int(doc_id), [0.0] * DIM)[int(bucket)] = float(value)
    mismatches = [
        (i, texts[i])
        for i, vec in enumerate(spark_side)
        if vec != pytest.approx(duck.get(i, [0.0] * DIM), abs=0.0)
    ]
    assert not mismatches, mismatches[:3]
