"""Inverted text index as a postings table.

Pinot's text index (StandardIndexes.java:69-141 text/Lucene; queried via
TEXT_MATCH, TextMatchFilterOperator.java) has no parquet analog, so the
Spark-first shape is an explicit postings table: (term, doc_id) rows,
bucketable/partitionable by term. A term query becomes a semi join
against the postings instead of a regex scan of every document — at
100 TB the postings for one term are a partition-pruned fraction of the
corpus, which is exactly what the inverted index buys Pinot.

AND semantics over multiple terms = postings intersect (groupBy doc_id
HAVING count = n_terms); OR = semi join on the term set; phrase/regex
fall back to the rlike scan path (fn_text_match_like).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def tokenize(text_col) -> F.Column:
    """Lowercased word tokens (Lucene StandardAnalyzer-ish: split on
    non-alphanumeric, drop empties)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(
        F.split(F.lower(c), r"[^a-z0-9]+"), lambda t: F.length(t) > 0
    )


def build_text_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str] | None = None,
    payload_cols: list[str] | tuple[str, ...] = (),
) -> DataFrame:
    """Postings table: one (term, id) row per distinct term per document.
    Persist with write_segments(partition/bucket by term) for pruning.

    Round-17 optimizations (guide §2.3 shuffle fewer bytes / §3 explode
    multiplies):

    - ``terms`` prunes the postings to that term set AT BUILD TIME — the
      on-the-fly analog of partition-pruning a persisted postings table
      to the query's posting lists. Without it, a one-shot search
      exploded EVERY distinct token of every document (~1M rows at
      sf0.1) only for ``search_all`` to discard all but the query terms;
      the ``array_intersect`` keeps the explode to ≤|terms| rows per
      document. Postings for the given terms are identical either way.
    - ``payload_cols`` carries extra per-document columns on each
      posting row (Pinot's segment-local docId→column lookup after the
      text-index filter), so a search that only needs those columns
      skips the join back to the corpus — one scan instead of two.
    - when ``terms`` is given (and no term is empty), the raw
      split feeds ``array_intersect`` directly: intersect already
      de-duplicates and drops every token outside the term set —
      including the empty strings ``tokenize``'s length filter exists
      for — so the per-document ``array_distinct`` pass and the
      higher-order length-filter lambda are pure overhead (guide §1.2
      per-task work; interleaved A/B at sf0.1: 0.743 → 0.598 s median
      on text_inverted_index_search, postings proved identical).
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    if terms is not None and all(t.lower() for t in terms):
        toks = F.array_intersect(
            F.split(F.lower(c), r"[^a-z0-9]+"),
            F.array(*[F.lit(t.lower()) for t in terms]),
        )
    elif terms is not None:
        toks = F.array_intersect(
            F.array_distinct(tokenize(text_col)),
            F.array(*[F.lit(t.lower()) for t in terms]),
        )
    else:
        toks = F.array_distinct(tokenize(text_col))
    pay = [F.col(c) for c in payload_cols]
    return (
        df.select(F.col(id_col), *pay, F.explode(toks).alias("term"))
        .select("term", id_col, *payload_cols)
    )


def search_all(
    index: DataFrame,
    id_col: str | list[str],
    terms: list[str],
    distinct_postings: bool = True,
) -> DataFrame:
    """Documents containing ALL terms (TEXT_MATCH 'a AND b'): postings
    intersect via a single groupBy — shuffle carries only matching
    postings rows. ``id_col`` may be a list (id + payload columns from a
    payload-carrying index); payload columns ride the same groupBy keys,
    adding nothing to the shuffle beyond their width.

    PRECONDITION (``distinct_postings=True``, the default): ``index`` is
    distinct on (term, id). Counts then use plain ``count(*)``, NOT
    ``count_distinct(term)``: ``build_text_index`` emits each (term, id)
    posting at most once (a posting list holds one docId per term —
    array_distinct or array_intersect dedups before the explode), and a
    distinct aggregate here would plan as Spark's two-phase distinct
    shape, one extra Exchange per search (guide §2.4: a distinct on
    already-unique data is a removable shuffle; round-17 closing A/B at
    sf0.1: 0.964 → 0.813 s median on text_inverted_index_search). For a
    postings table NOT built by ``build_text_index`` that may hold
    duplicate (term, id) rows, pass ``distinct_postings=False`` to get
    the duplicate-safe ``count_distinct(term)`` intersection instead
    (one extra exchange, correct on any input)."""
    ids = [id_col] if isinstance(id_col, str) else list(id_col)
    hits = index.filter(F.col("term").isin([t.lower() for t in terms]))
    nt = F.count("*") if distinct_postings else F.count_distinct("term")
    return (
        hits.groupBy(*ids)
        .agg(nt.alias("__nt"))
        .filter(F.col("__nt") == len(terms))
        .select(*ids)
    )


def search_any(index: DataFrame, id_col: str, terms: list[str]) -> DataFrame:
    """Documents containing ANY term (TEXT_MATCH 'a OR b')."""
    return (
        index.filter(F.col("term").isin([t.lower() for t in terms]))
        .select(id_col)
        .distinct()
    )


def regex_match_dictionary(df: DataFrame, col: str, pattern: str) -> DataFrame:
    """FST/IFST index analog (StandardIndexes.java fst — regex over the
    term DICTIONARY, not the rows): evaluate the regex against the
    column's distinct values, then semi-join the matches back.

    At 100 TB a low-cardinality string column has a dictionary orders of
    magnitude smaller than the corpus; the regex runs |dict| times instead
    of |rows| times and the row selection is a hash semi join. Same
    result as ``df.filter(col rlike pattern)`` — asserted in
    tests/test_text_index_fst.py.
    """
    c = F.col(col)
    matching = df.select(c.alias("__term")).distinct().filter(F.col("__term").rlike(pattern))
    return df.join(
        F.broadcast(matching.withColumnRenamed("__term", col)), col, "left_semi"
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
):
    """BM25-ranked retrieval over the postings shape (Robertson &
    Zaragoza 2009, "The Probabilistic Relevance Framework: BM25 and
    Beyond" — the public Okapi BM25 formula, Lucene-style
    idf = ln(1 + (N − df + 0.5)/(df + 0.5))):

        score(d) = Σ_t idf(t) · tf(t,d)·(k1+1)
                            / (tf(t,d) + k1·(1 − b + b·len(d)/avglen))

    Pinot's TEXT_MATCH filters but never ranks (the Lucene scorer is not
    surfaced — TextMatchFilterOperator.java); this operator adds the
    ranking half a retrieval-for-dedup/contamination pipeline needs.

    Scale shape (100 TB): term frequencies pre-aggregate per (doc, term)
    map-side; document frequencies and the corpus length stats are two
    tiny aggregates broadcast back in; only documents containing a query
    term ever leave the scan (inner join on the term list), and the
    top-k is TakeOrderedAndProject, never a full sort."""
    toks = tokenize(text_col)
    base = df.select(F.col(id_col), toks.alias("__t")).withColumn(
        "__len", F.size("__t")
    )
    stats = base.agg(
        F.count("*").cast("double").alias("__N"),
        F.avg("__len").alias("__avglen"),
    )
    tf = (
        base.select(id_col, "__len", F.explode("__t").alias("term"))
        .filter(F.col("term").isin(*terms))
        .groupBy(id_col, "__len", "term")
        .agg(F.count("*").cast("double").alias("__tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("double").alias("__df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__idf",
            # ln(1 + x) spelled literally (not log1p) so a SQL oracle's
            # ln(1 + x) reproduces the double bit-for-bit
            F.log(F.lit(1.0) + (F.col("__N") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)),
        )
        .withColumn(
            "__s",
            F.col("__idf")
            * (F.col("__tf") * (k1 + 1))
            / (
                F.col("__tf")
                + k1 * (1 - b + b * F.col("__len") / F.col("__avglen"))
            ),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_terms_hit"),
            F.sum("__s").alias("__score"),
        )
        .orderBy(F.desc("__score"), id_col)
        .limit(k)
        .select(id_col, "n_terms_hit", F.round("__score", 4).alias("bm25"))
    )
