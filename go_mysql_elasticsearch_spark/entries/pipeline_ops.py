"""Training-data pipeline entries: dedup, similarity, text analysis,
multimodal plumbing (driver gate over documents/embeddings tables)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..analyzer import duckdb_tokens_sql
from ..pipeline import clean as C
from ..pipeline import dedup as D
from ..pipeline import similarity as S
from ..pipeline import textstats as T
from ..pipeline.curation import dedup_units_sql
from ..pipeline.quality import gopher_quality_sql, unigram_perplexity_sql
from ..registry import index_for

_TOKENS_SQL = duckdb_tokens_sql("text")


def _docs(spark, sf_dir):
    return index_for(spark, sf_dir).docstore().select("doc_id", "text")


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def q_dedup_exact(spark, sf_dir):
    return D.exact_dedup_stats(_docs(spark, sf_dir))


def q_dedup_minhash(spark, sf_dir):
    """MinHash(8) + LSH(4 bands × 2) → exact-Jaccard verify ≥ 0.5."""
    docs = _docs(spark, sf_dir)
    sig = D.minhash_signatures(docs, k=8)
    pairs = D.minhash_candidate_pairs(sig, k=8, rows_per_band=2)
    return D.shingle_jaccard(docs, pairs).where(F.col("jaccard") >= 0.5)


def q_dedup_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard >= 0.5 pairs via the df-capped gram
    inverted index (deterministic recall, unlike MinHash banding)."""
    return D.ngram_jaccard_pairs(_docs(spark, sf_dir), n=3, tau=0.5, max_gram_df=20)


def q_sim_pairs_exact(spark, sf_dir):
    """Exact shingle-Jaccard top-5 pairs among doc_id < 60 (the n²
    baseline the LSH path approximates)."""
    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 60)
    a = docs.select(F.col("doc_id").alias("a"))
    b = docs.select(F.col("doc_id").alias("b"))
    pairs = a.crossJoin(b).where(F.col("a") < F.col("b"))
    j = D.shingle_jaccard(docs, pairs)
    return j.orderBy(F.desc("jaccard"), F.asc("a"), F.asc("b")).limit(5)


def q_dedup_simhash(spark, sf_dir):
    return D.simhash64(_docs(spark, sf_dir).where(F.col("doc_id") < 50))


def q_ann_brute(spark, sf_dir):
    return S.cosine_topk(_emb(spark, sf_dir), query_vec_id=0, k=5)


def _emb_aug(spark, sf_dir):
    """Embeddings plus 5 planted near-twins (vec_id+10^7 = copy of
    vec_id<5 with dim 1 nudged by +0.05; the offset is far beyond any
    real vec_id at every scale factor). The fixture corpus has no
    pair above cos 0.52 — sign-LSH legitimately finds nothing there —
    so the twins give the ANN/near-dup entries non-trivial,
    deterministic results. The oracle SQL plants the SAME twins
    (identical double arithmetic both engines)."""
    e = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    twins = e.where(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1) + F.lit(0.05)),
            F.slice("embedding", 2, 63),
        ).alias("embedding"),
    )
    return e.unionByName(twins)


_AUG_SQL = """aug AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 10000000, list_concat([v[1] + 0.05], v[2:64])
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
  WHERE vec_id < 5
)"""


def _sigs(spark, sf_dir):
    """Persisted (vec_id, sig) LSH signature index beside the corpus —
    built once per sf_dir (resume contract like the postings
    manifests), reused by every ANN / near-dup entry."""
    import hashlib
    import os

    from ..registry import IDX_CACHE_ROOT

    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    path = os.path.join(IDX_CACHE_ROOT, f"sigs64r4-{os.path.basename(sf_dir)}-{tag}")
    return S.build_sig_index(spark, _emb_aug(spark, sf_dir), path, n_planes=64)


def q_ann_lsh(spark, sf_dir):
    """ANN top-5 via the persisted signature index: bucket lookup
    (query sig ± 1 bit, broadcast join) → exact cosine re-rank. The
    oracle computes bit-identical signatures from the same hyperplane
    constants and the same hamming-1 candidate rule."""
    return S.lsh_ann_topk(
        _emb_aug(spark, sf_dir), query_vec_id=0, k=5, n_planes=64,
        sigs=_sigs(spark, sf_dir),
    )


def q_ann_ivf(spark, sf_dir):
    """IVF-Flat ANN over the twin-augmented embeddings: persisted
    deterministic k-means cells, probe the 2 nearest, exact-cosine
    re-rank. The Lloyd iterations are seedless and fixed-count, so the
    oracle replays them in SQL (:func:`ivf_oracle_sql`); recall and
    plan shape are additionally pytest-asserted
    (tests/test_pipeline_ops.py::test_ivf_*)."""
    import hashlib
    import os

    from ..pipeline import ivf as V
    from ..registry import IDX_CACHE_ROOT

    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    path = os.path.join(IDX_CACHE_ROOT, f"ivf8r3-{os.path.basename(sf_dir)}-{tag}")
    cells, cents = V.build_ivf_index(spark, _emb_aug(spark, sf_dir), path, nlist=8, iters=2)
    return V.ivf_ann_topk(_emb_aug(spark, sf_dir), cells, cents, 0, k=5, n_probe=2)


def ivf_oracle_sql(nlist: int = 8, iters: int = 2, dim: int = 64,
                   k: int = 5, n_probe: int = 2) -> str:
    """DuckDB twin of the WHOLE IVF path — the k-means is seedless
    (init = vectors of the nlist smallest md5(vec_id)) with a FIXED
    iteration count, so Lloyd unrolls into ``iters`` assignment/mean
    CTE pairs. Ties break exactly as numpy argmin does (lowest cell
    id); empty cells keep their previous centroid, as
    kmeans_deterministic does."""
    d2 = ("list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.c)"
          " + list_dot_product(c.c, c.c)")
    parts = [f"""c0 AS (
  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cell, v AS c
  FROM (SELECT vec_id, v, md5(vec_id::VARCHAR) AS h FROM aug
        ORDER BY h, vec_id LIMIT {nlist})
)"""]
    for it in range(iters):
        parts.append(f"""a{it} AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, c.cell,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY {d2} ASC, c.cell ASC) AS rn
    FROM aug e CROSS JOIN c{it} c
  ) WHERE rn = 1
)""")
        parts.append(f"""m{it} AS (
  SELECT cell, list(m ORDER BY i) AS c FROM (
    SELECT cell, i, avg(v[i]) AS m FROM a{it}, range(1, {dim + 1}) t(i)
    GROUP BY cell, i
  ) GROUP BY cell
)""")
        parts.append(f"""c{it + 1} AS (
  SELECT p.cell, coalesce(m.c, p.c) AS c FROM c{it} p LEFT JOIN m{it} m USING (cell)
)""")
    final = f"c{iters}"
    parts.append(f"""afin AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, c.cell,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY {d2} ASC, c.cell ASC) AS rn
    FROM aug e CROSS JOIN {final} c
  ) WHERE rn = 1
)""")
    parts.append("q AS (SELECT v AS qv FROM aug WHERE vec_id = 0)")
    parts.append(f"""probe AS (
  SELECT c.cell FROM {final} c, q
  ORDER BY list_dot_product(q.qv, q.qv) - 2 * list_dot_product(q.qv, c.c)
           + list_dot_product(c.c, c.c) ASC, c.cell ASC
  LIMIT {n_probe}
)""")
    body = ",\n".join(parts)
    return f"""WITH {_AUG_SQL},
{body}
SELECT a.vec_id,
       round(list_dot_product(a.v, q.qv)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cos
FROM afin a JOIN probe USING (cell) CROSS JOIN q
WHERE a.vec_id <> 0
ORDER BY cos DESC, a.vec_id ASC LIMIT {k}""".strip()


def q_ann_pq(spark, sf_dir):
    """Product-quantization ANN (pipeline/pq.py): per-subspace
    deterministic codebooks, persisted code table, driver-side ADC LUT
    inlined as plan literals (pure-Catalyst distance projection — no
    join, no Python), top-R by rounded ADC, exact cosine re-rank. The
    oracle replays training + encoding + ADC in SQL
    (:func:`pq_oracle_sql`)."""
    import hashlib
    import os

    from ..pipeline import pq as P
    from ..registry import IDX_CACHE_ROOT

    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    path = os.path.join(IDX_CACHE_ROOT, f"pq28r5-{os.path.basename(sf_dir)}-{tag}")
    codes, cbs = P.build_pq_index(spark, _emb(spark, sf_dir), path, m=2, ks=8, iters=2)
    return P.pq_ann_topk(_emb(spark, sf_dir), codes, cbs, 0, k=5, rerank=20)


def pq_oracle_sql(m: int = 2, ks: int = 4, iters: int = 2, dim: int = 64,
                  k: int = 5, rerank: int = 20, qid: int = 0) -> str:
    """DuckDB twin of the WHOLE PQ path: per-subspace seedless Lloyd
    (same unroll recipe as :func:`ivf_oracle_sql`, on v[lo:hi] slices —
    every subspace seeds from the same ks smallest-md5 vec_ids),
    argmin encoding, ADC via per-subspace LUTs (round(·,6) before the
    top-R cut, matching the Spark side), exact cosine re-rank."""
    sublen = dim // m
    parts = ["""emb0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)"""]
    code_cols, lut_joins = [], []
    for j in range(m):
        lo, hi = j * sublen + 1, (j + 1) * sublen
        sv = f"e.v[{lo}:{hi}]"
        d2 = (f"list_dot_product({sv}, {sv}) - 2 * list_dot_product({sv}, c.c)"
              " + list_dot_product(c.c, c.c)")
        parts.append(f"""s{j}c0 AS (
  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cell, v[{lo}:{hi}] AS c
  FROM (SELECT vec_id, v, md5(vec_id::VARCHAR) AS h FROM emb0
        ORDER BY h, vec_id LIMIT {ks})
)""")
        for it in range(iters):
            parts.append(f"""s{j}a{it} AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, c.cell,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY {d2} ASC, c.cell ASC) AS rn
    FROM emb0 e CROSS JOIN s{j}c{it} c
  ) WHERE rn = 1
)""")
            parts.append(f"""s{j}m{it} AS (
  SELECT cell, list(mv ORDER BY i) AS c FROM (
    SELECT cell, i, avg((v[{lo}:{hi}])[i]) AS mv FROM s{j}a{it}, range(1, {sublen + 1}) t(i)
    GROUP BY cell, i
  ) GROUP BY cell
)""")
            parts.append(f"""s{j}c{it + 1} AS (
  SELECT p.cell, coalesce(m.c, p.c) AS c FROM s{j}c{it} p LEFT JOIN s{j}m{it} m USING (cell)
)""")
        parts.append(f"""codes{j} AS (
  SELECT vec_id, cell AS code{j} FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY {d2} ASC, c.cell ASC) AS rn
    FROM emb0 e CROSS JOIN s{j}c{iters} c
  ) WHERE rn = 1
)""")
        parts.append(f"""lut{j} AS (
  SELECT c.cell,
         list_dot_product(q.qv[{lo}:{hi}], q.qv[{lo}:{hi}])
         - 2 * list_dot_product(q.qv[{lo}:{hi}], c.c)
         + list_dot_product(c.c, c.c) AS d
  FROM s{j}c{iters} c, q
)""")
        code_cols.append(f"codes{j}")
        lut_joins.append(f"JOIN lut{j} ON lut{j}.cell = codes0.code{j}"
                         if j == 0 else
                         f"JOIN lut{j} ON lut{j}.cell = codes{j}.code{j}")
    parts.insert(1, f"q AS (SELECT v AS qv FROM emb0 WHERE vec_id = {qid})")
    codes_join = code_cols[0] + "".join(f" JOIN {c} USING (vec_id)" for c in code_cols[1:])
    adc_sum = " + ".join(f"lut{j}.d" for j in range(m))
    parts.append(f"""cand AS (
  SELECT codes0.vec_id, round({adc_sum}, 6) AS adc
  FROM {codes_join} {' '.join(lut_joins)}
  WHERE codes0.vec_id <> {qid}
  ORDER BY adc ASC, codes0.vec_id ASC LIMIT {rerank}
)""")
    body = ",\n".join(parts)
    return f"""WITH {body}
SELECT cand.vec_id,
       round(list_dot_product(e.v, q.qv)
             / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cos
FROM cand JOIN emb0 e USING (vec_id) CROSS JOIN q
ORDER BY cos DESC, cand.vec_id ASC LIMIT {k}""".strip()


def q_dedup_units(spark, sf_dir):
    """C4-style duplicate-unit removal (sentence units): corpus-wide
    unit counts on uniform 60-bit hashes, per-doc dup accounting +
    ordered re-assembly of the kept units."""
    from ..pipeline.curation import dedup_units

    return dedup_units(_docs(spark, sf_dir)).orderBy("doc_id")


def q_quality_perplexity(spark, sf_dir):
    """Unigram-LM perplexity (CCNet-shape quality gate, pipeline/
    quality.py): one vocabulary agg + one token→probability join + one
    per-doc mean-of-logs; no UDFs, no driver data."""
    from ..pipeline.quality import unigram_perplexity

    return unigram_perplexity(_docs(spark, sf_dir)).orderBy("doc_id")


def q_gopher_quality(spark, sf_dir):
    """Gopher rule battery (Rae et al. 2021 A1.1): word count, mean
    word length, alphabetic fraction, stopword evidence → pass/fail,
    as ONE shuffle-free Catalyst projection."""
    from ..pipeline.quality import gopher_quality

    return gopher_quality(_docs(spark, sf_dir)).orderBy("doc_id")


def q_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup pairs (exact all-pairs baseline, input
    bounded by max_id — the oracle shape the LSH path is checked
    against; production path: dedup_embedding_lsh)."""
    return S.cosine_near_dups(_emb(spark, sf_dir), threshold=0.35, max_id=200)


def q_dedup_embedding_lsh(spark, sf_dir):
    """Bucketed near-dup mining over the FULL (twin-augmented)
    embeddings table — no id cap, because there is no cartesian to
    bound: persisted signatures → band self-join (pigeonhole covers
    hamming <= 3) → hamming filter → exact cosine >= 0.5."""
    return S.cosine_near_dups_lsh(
        _emb_aug(spark, sf_dir), threshold=0.5, n_planes=64, n_bands=4, max_hamming=3,
        sigs=_sigs(spark, sf_dir),
    )


def q_dedup_simhash_pairs(spark, sf_dir):
    """SimHash pair mining: byte-band join → hamming <= 3 verify."""
    return D.simhash_near_pairs(_docs(spark, sf_dir), max_hamming=3)


def q_lang_id(spark, sf_dir):
    return T.lang_id(_docs(spark, sf_dir))


def q_quality(spark, sf_dir):
    return T.quality_score(_docs(spark, sf_dir))


def q_token_counts(spark, sf_dir):
    return T.token_counts(_docs(spark, sf_dir))


def q_fingerprint(spark, sf_dir):
    return T.fingerprint(_docs(spark, sf_dir))


def q_boilerplate(spark, sf_dir):
    """Corpus-boilerplate 5-gram spans (pipeline/textstats.py
    boilerplate_ngrams — the C4/RefinedWeb boilerplate-removal step):
    document frequency of n-gram spans, top candidates."""
    return T.boilerplate_ngrams(_docs(spark, sf_dir))


def q_repetition(spark, sf_dir):
    """Intra-doc n-gram repetition (RefinedWeb dup_ngram_frac signal,
    pipeline/textstats.py repetition_scores) — shuffle-free per-row
    projection."""
    return T.repetition_scores(_docs(spark, sf_dir))


def q_url_host_stats(spark, sf_dir):
    """Docs per host over the webpages table (pipeline/urls.py
    host_stats) — the crawl-budget / domain-mix view; the oracle
    reconstructs the deterministic url from doc_id and applies the
    same host extraction."""
    from ..pipeline.urls import host_stats
    from ..webpages import webpages

    return host_stats(webpages(spark, sf_dir).select("url"))


def q_corpus_clean_stats(spark, sf_dir):
    """The composed cleaning funnel (pipeline/clean.py): per-stage
    rejection counts — short -> repetitive -> exact-dup -> clean."""
    from ..pipeline.clean import clean_corpus

    _, stats = clean_corpus(_docs(spark, sf_dir).select("doc_id", "text"))
    return stats


def q_binary_meta(spark, sf_dir):
    """Multimodal metadata plumbing over the html binary column
    (webpages-shaped input; decode kernels stubbed — pipeline/
    multimodal.py)."""
    from ..pipeline.multimodal import binary_metadata
    from ..webpages import webpages

    wp = webpages(spark, sf_dir)
    return binary_metadata(wp, bin_col="html").select("doc_id", "n_bytes", "kind")


_SHINGLE = (
    "list_distinct(CASE WHEN len(t) >= 3 THEN list_transform(range(1, len(t) - 1), "
    "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) ELSE [] END)"
)
_H60 = "cast(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"


def _minhash_sql(where: str = "") -> str:
    mh = ", ".join(
        "min(" + _H60.format(x=f"sh || '#{i}'") + f") AS mh_{i}" for i in range(8)
    )
    return f"""tk AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents {where}),
shg AS (SELECT doc_id, unnest({_SHINGLE}) AS sh FROM tk),
sig AS (SELECT doc_id, {mh} FROM shg GROUP BY doc_id)"""


_JACCARD_PAIR = """
SELECT p.a, p.b,
       round(len(list_intersect(sa.s, sb.s)) / len(list_distinct(list_concat(sa.s, sb.s)))::DOUBLE, 6) AS jaccard
FROM pairs p
JOIN shs sa ON sa.doc_id = p.a
JOIN shs sb ON sb.doc_id = p.b"""


ENTRIES = {
    "dedup_exact": (
        q_dedup_exact,
        f"""WITH g AS (SELECT {_H60.format(x='text')} AS chash, count(*) AS c FROM documents GROUP BY 1)
SELECT sum(c)::BIGINT AS n_docs, count(*)::BIGINT AS n_unique, (sum(c) - count(*))::BIGINT AS n_dups FROM g""",
    ),
    "dedup_minhash_lsh": (
        q_dedup_minhash,
        f"""WITH {_minhash_sql()},
bands AS (
  SELECT doc_id, b.band, CASE b.band
    WHEN 0 THEN mh_0 || '|' || mh_1 WHEN 1 THEN mh_2 || '|' || mh_3
    WHEN 2 THEN mh_4 || '|' || mh_5 ELSE mh_6 || '|' || mh_7 END AS bkey
  FROM sig, (SELECT unnest(range(4)) AS band) b
),
pairs AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
),
shs AS (SELECT doc_id, {_SHINGLE} AS s FROM tk)
SELECT * FROM ({_JACCARD_PAIR}) WHERE jaccard >= 0.5""",
    ),
    "dedup_ngram_jaccard": (
        q_dedup_ngram_jaccard,
        f"""WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
shs AS (SELECT doc_id, {_SHINGLE} AS s FROM tk),
shg AS (SELECT doc_id, unnest(s) AS sh FROM shs),
rare AS (SELECT sh FROM shg GROUP BY sh HAVING count(*) BETWEEN 2 AND 20),
post AS (SELECT g.doc_id, g.sh FROM shg g JOIN rare r ON r.sh = g.sh),
pairs AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
          FROM post x JOIN post y ON x.sh = y.sh AND x.doc_id < y.doc_id)
SELECT * FROM ({_JACCARD_PAIR}) WHERE jaccard >= 0.5""",
    ),
    "sim_pairs_exact": (
        q_sim_pairs_exact,
        f"""WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
           FROM documents WHERE doc_id < 60),
shs AS (SELECT doc_id, {_SHINGLE} AS s FROM tk),
pairs AS (SELECT x.doc_id AS a, y.doc_id AS b FROM shs x JOIN shs y ON x.doc_id < y.doc_id)
SELECT * FROM ({_JACCARD_PAIR}) ORDER BY jaccard DESC, a ASC, b ASC LIMIT 5""",
    ),
    "dedup_simhash": (
        q_dedup_simhash,
        D.simhash64_sql(where="WHERE doc_id < 50"),
    ),
    "ann_cosine_brute": (
        q_ann_brute,
        """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
SELECT vec_id,
       round(list_dot_product(v, qv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 4) AS cos
FROM e, q WHERE vec_id <> 0
ORDER BY cos DESC, vec_id ASC LIMIT 5""",
    ),
    "ann_ivf": (q_ann_ivf, ivf_oracle_sql(nlist=8, iters=2, dim=64, k=5, n_probe=2)),
    "ann_pq": (q_ann_pq, pq_oracle_sql(m=2, ks=8, iters=2, dim=64, k=5, rerank=20)),
    "ann_lsh": (
        q_ann_lsh,
        f"""WITH {_AUG_SQL},
s AS (SELECT vec_id, v, {S.sig_sql_expr(64, 64)} AS sig FROM aug),
q AS (SELECT sig AS qsig, v AS qv FROM s WHERE vec_id = 0)
SELECT vec_id,
       round(list_dot_product(v, qv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 4) AS cos
FROM s, q
WHERE vec_id <> 0 AND bit_count(xor(sig, qsig)) <= 1
ORDER BY cos DESC, vec_id ASC LIMIT 5""",
    ),
    "dedup_embedding_lsh": (
        q_dedup_embedding_lsh,
        f"""WITH {_AUG_SQL},
s AS (SELECT vec_id, v, {S.sig_sql_expr(64, 64)} AS sig FROM aug),
cand AS (
  SELECT x.vec_id AS a, y.vec_id AS b, x.v AS va, y.v AS vb
  FROM s x JOIN s y ON x.vec_id < y.vec_id
  WHERE bit_count(xor(x.sig, y.sig)) <= 3
)
SELECT a, b,
       round(list_dot_product(va, vb) / (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb))), 4) AS cos
FROM cand
WHERE round(list_dot_product(va, vb) / (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb))), 4) >= 0.5
ORDER BY a ASC, b ASC""",
    ),
    "dedup_simhash_pairs": (
        q_dedup_simhash_pairs,
        D.simhash_near_pairs_sql(max_hamming=3),
    ),
    "dedup_embedding_cosine": (
        q_dedup_embedding,
        """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 200)
SELECT a.vec_id AS a, b.vec_id AS b,
       round(list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS cos
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) >= 0.35
ORDER BY a ASC, b ASC""",
    ),
    "text_lang_id": (q_lang_id, T.LANG_ID_SQL),
    "text_quality": (q_quality, T.QUALITY_SQL),
    "dedup_units": (
        q_dedup_units,
        dedup_units_sql() + " ORDER BY doc_id",
    ),
    "quality_perplexity": (
        q_quality_perplexity,
        unigram_perplexity_sql(_TOKENS_SQL) + " ORDER BY doc_id",
    ),
    "gopher_quality": (
        q_gopher_quality,
        gopher_quality_sql(_TOKENS_SQL) + " ORDER BY doc_id",
    ),
    "text_token_counts": (q_token_counts, T.TOKEN_COUNTS_SQL),
    "text_fingerprint": (q_fingerprint, T.FINGERPRINT_SQL),
    "corpus_clean_stats": (
        q_corpus_clean_stats,
        C.clean_stats_sql("regexp_extract_all(lower(text), '[a-z0-9]+')"),
    ),
    "url_host_stats": (
        q_url_host_stats,
        """WITH u AS (
  SELECT 'https://site' || (doc_id % 97) || '.example/page/' || doc_id AS url
  FROM documents
)
SELECT regexp_replace(lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)), ':[0-9]+$', '') AS host,
       count(*) AS n_pages
FROM u GROUP BY host ORDER BY n_pages DESC, host ASC LIMIT 10""",
    ),
    "text_repetition": (
        q_repetition,
        T.repetition_sql("regexp_extract_all(lower(text), '[a-z0-9]+')"),
    ),
    "text_boilerplate_ngrams": (
        q_boilerplate,
        T.boilerplate_sql("regexp_extract_all(lower(text), '[a-z0-9]+')"),
    ),
    # the html binary exists only engine-side, but it is the
    # DETERMINISTIC wrap of documents.text (analyzer.wrap_html):
    # 115 fixed wrapper chars + 'doc <id>' title + html-escaped body,
    # utf-8 encoded — so the oracle reconstructs byte length and kind
    # from text alone
    "binary_metadata": (
        q_binary_meta,
        """SELECT doc_id,
       CASE WHEN text IS NULL THEN 0 ELSE
         115 + octet_length(encode('doc ' || doc_id::VARCHAR))
             + octet_length(encode(replace(replace(replace(text, '&', '&amp;'),
                                                   '<', '&lt;'), '>', '&gt;')))
       END::BIGINT AS n_bytes,
       CASE WHEN text IS NULL THEN 'empty' ELSE 'text/html' END AS kind
FROM documents""",
    ),
}


# --- corpus curation (decontamination / substring dedup / PII / mixing) ----

def q_decontaminate(spark, sf_dir):
    """Test-set decontamination (GPT-3 13-gram recipe, n=8 for the
    short synthetic docs): flag training docs sharing an 8-gram with
    the 'benchmark' slice (doc_id < 5). Benchmark hashes broadcast;
    corpus text never shuffles."""
    from ..pipeline.curation import decontaminate

    docs = _docs(spark, sf_dir)
    bench = docs.where(F.col("doc_id") < 5)
    corpus = docs.where(F.col("doc_id") >= 5)
    return decontaminate(corpus, bench, n=8).orderBy("doc_id")


def q_exact_substr(spark, sf_dir):
    """ExactSubstr-style duplicated-span report (Lee et al. 2021,
    distributed approximation): 10-token windows hashed corpus-wide;
    windows in >= 2 docs mark duplicated spans."""
    from ..pipeline.curation import exact_substr_spans

    return exact_substr_spans(_docs(spark, sf_dir), n=10).orderBy("doc_id")


def _pii_augmented(spark, sf_dir):
    """Deterministic PII-bearing corpus: the synthetic text has no PII,
    so docs at doc_id % 7 == 0 get an email and % 11 == 0 a phone +
    IPv4 appended — IDENTICAL string construction in the oracle, so
    scrub results value-hash across engines."""
    d = _docs(spark, sf_dir)
    email = F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"), F.lit("@example.com"))
    phone = F.lit(" call 555-123-4567 from 10.0.0.1")
    return d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 7 == 0, email).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0, phone).otherwise(F.lit("")),
        ).alias("text"),
    )


def q_pii_scrub(spark, sf_dir):
    """PII scrubbing audit: redact emails/phones/IPv4 (pure-Catalyst
    regexp chain), per-doc class counts; only docs that had any PII
    are returned (the audit view)."""
    from ..pipeline.curation import pii_scrub

    out = pii_scrub(_pii_augmented(spark, sf_dir))
    return out.where(
        (F.col("n_email") + F.col("n_phone") + F.col("n_ipv4")) > 0
    ).orderBy("doc_id")


def q_domain_mix(spark, sf_dir):
    """Deterministic domain-mixture sampling (DoReMi/Pile-style
    reweighting): per-host md5 bucket -> target rate; page kept iff
    md5(url) lands under the rate. Per-host audit counts."""
    from ..pipeline.curation import domain_mix_sample
    from ..webpages import webpages

    rates = {0: 0.25, 1: 0.5, 2: 0.75, 3: 1.0}
    wp = webpages(spark, sf_dir).select("url")
    return domain_mix_sample(wp, rates).orderBy("host")


from ..pipeline.curation import decontaminate_sql, exact_substr_sql  # noqa: E402

_PII_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
_PII_PHONE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"
_PII_IP = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"

_PII_SQL = f"""WITH aug AS (
  SELECT doc_id, text ||
    CASE WHEN doc_id % 7 = 0 THEN ' contact user' || doc_id::VARCHAR || '@example.com' ELSE '' END ||
    CASE WHEN doc_id % 11 = 0 THEN ' call 555-123-4567 from 10.0.0.1' ELSE '' END AS s
  FROM documents
),
s1 AS (
  SELECT doc_id, len(regexp_extract_all(s, '{_PII_EMAIL}'))::BIGINT AS n_email,
         regexp_replace(s, '{_PII_EMAIL}', '<EMAIL>', 'g') AS s FROM aug
),
s2 AS (
  SELECT doc_id, n_email, len(regexp_extract_all(s, '{_PII_PHONE}'))::BIGINT AS n_phone,
         regexp_replace(s, '{_PII_PHONE}', '<PHONE>', 'g') AS s FROM s1
),
s3 AS (
  SELECT doc_id, n_email, n_phone, len(regexp_extract_all(s, '{_PII_IP}'))::BIGINT AS n_ipv4,
         regexp_replace(s, '{_PII_IP}', '<IP>', 'g') AS scrubbed FROM s2
)
SELECT doc_id, scrubbed, n_email, n_phone, n_ipv4 FROM s3
WHERE n_email + n_phone + n_ipv4 > 0 ORDER BY doc_id"""

_HOST_RE = "^[a-z]+://([^/]+)"  # no trailing slash: path-less URLs keep their host
_DOMAIN_MIX_SQL = f"""WITH wp AS (
  SELECT 'https://site' || (doc_id % 97)::VARCHAR || '.example/page/' || doc_id::VARCHAR AS url
  FROM documents
),
x AS (
  SELECT regexp_extract(url, '{_HOST_RE}', 1) AS host,
         {_H60.format(x=f"regexp_extract(url, '{_HOST_RE}', 1)")} % 4 AS bucket,
         {_H60.format(x='url')} % 10000 AS u
  FROM wp
)
SELECT host, bucket, count(*)::BIGINT AS n_pages,
       sum(CASE WHEN u < (CASE bucket WHEN 0 THEN 0.25 WHEN 1 THEN 0.5 WHEN 2 THEN 0.75 ELSE 1.0 END) * 10000
                THEN 1 ELSE 0 END)::BIGINT AS n_kept
FROM x GROUP BY host, bucket ORDER BY host"""

ENTRIES.update(
    {
        "decontaminate_ngrams": (
            q_decontaminate,
            decontaminate_sql(
                bench_where="WHERE doc_id < 5", corpus_where="WHERE doc_id >= 5", n=8
            ) + " ORDER BY doc_id",
        ),
        "exact_substr_spans": (
            q_exact_substr,
            exact_substr_sql(n=10) + " ORDER BY doc_id",
        ),
        "pii_scrub_stats": (q_pii_scrub, _PII_SQL),
        "domain_mix_sample": (q_domain_mix, _DOMAIN_MIX_SQL),
    }
)


def q_stream_dedup(spark, sf_dir):
    """Cross-batch streaming dedup, batch twin: first-seen row per
    content key with duplicate counts (streaming path =
    dropDuplicatesWithinWatermark, asserted equivalent across
    micro-batches in tests/test_dedupstream.py)."""
    from ..streaming.dedupstream import dedup_events

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return dedup_events(ev).orderBy("event_id")


def q_stream_topk_cms(spark, sf_dir):
    """Mergeable heavy-hitter sketch, gated through a REAL Structured
    Streaming run: the events table is consumed as a file-source stream
    (availableNow), each micro-batch's 4096-cell CMS partial folds into
    one fixed 32 KiB driver table (streaming/cmsstream.py), and the
    estimates come from THAT accumulator — so the hash gate certifies
    the streaming path itself, not a batch stand-in. CMS linearity
    (stream merge == one-shot batch sketch, cell-wise) is additionally
    asserted across forced multi-file micro-batches in
    tests/test_cmsstream.py."""
    import os
    import shutil
    import tempfile

    from ..streaming.cmsstream import cms_stream_sketch

    schema = "event_id long, user_id long, event_type string, ts timestamp, value double"
    # the file stream source wants a DIRECTORY; the fixture table is a
    # single parquet file — expose it through a symlink dir (no copy)
    src = f"{sf_dir}/events.parquet"
    d = None
    try:
        if os.path.isfile(src):
            d = tempfile.mkdtemp(prefix="cms_src_")
            os.symlink(os.path.abspath(src), os.path.join(d, "events.parquet"))
            src = d
        acc = cms_stream_sketch(spark, src, schema)
    finally:
        if d is not None:  # ADVICE r5: the symlink dir leaked per call
            shutil.rmtree(d, ignore_errors=True)
    probes = ["click", "view", "purchase", "signup", "error"]
    est = spark.createDataFrame(
        [(t, acc.estimate(t)) for t in probes], "term string, est long"
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = (
        ev.select(F.col("event_type").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("exact"))
    )
    return (
        est.join(exact, "term", "left")
        .select("term", "est", F.coalesce("exact", F.lit(0)).cast("long").alias("exact"))
        .orderBy("term")
    )


def _stream_topk_cms_sql() -> str:
    from ..pipeline.cms import estimate_sql

    probes = ["click", "view", "purchase", "signup", "error"]
    toks_select = "SELECT event_type AS term FROM events"
    in_list = ", ".join(f"'{t}'" for t in probes)
    return f"""WITH e AS ({estimate_sql(toks_select, 'duckdb', probes)}),
x AS (SELECT term, count(*) AS exact FROM ({toks_select}) WHERE term IN ({in_list}) GROUP BY term)
SELECT e.term, e.est, cast(coalesce(x.exact, 0) AS BIGINT) AS exact
FROM e LEFT JOIN x USING (term) ORDER BY term"""


from ..streaming.dedupstream import dedup_events_oracle_sql  # noqa: E402

ENTRIES.update({
    "stream_dedup": (q_stream_dedup, dedup_events_oracle_sql() + " ORDER BY event_id"),
    "stream_topk_cms": (q_stream_topk_cms, _stream_topk_cms_sql()),
})


# --- real image decode (netpbm — no codec library needed) -------------------

def _ppm_corpus(spark, sf_dir):
    """Deterministic 8x8 P6 images: flat pixel i of doc d has value
    (d*31 + i) % 256 — closed-form, so the oracle computes the decoded
    features arithmetically while the ENGINE must parse real PPM bytes
    (header + raw payload) to get the same numbers. Any decode bug
    breaks the value hash."""
    import numpy as np
    import pandas as pd

    from ..pipeline.multimodal import encode_ppm

    def make(batches):
        for pdf in batches:
            imgs = [
                encode_ppm(((int(d) * 31 + np.arange(192)) % 256)
                           .astype(np.uint8).reshape(8, 8, 3))
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"), "img": imgs})

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return docs.mapInPandas(make, schema="doc_id long, img binary")


def q_image_features(spark, sf_dir):
    """REAL image decode + feature extraction: PPM bytes parsed by the
    netpbm kernel (pipeline/multimodal.py decode_image), per-channel
    means + grayscale std via Arrow-batched mapInPandas."""
    from ..pipeline.multimodal import image_features

    return image_features(_ppm_corpus(spark, sf_dir), bin_col="img").orderBy("doc_id")


_IMAGE_FEATURES_SQL = """WITH px AS (
  SELECT doc_id, (doc_id * 31 + 3 * k) % 256 AS r,
         (doc_id * 31 + 3 * k + 1) % 256 AS g,
         (doc_id * 31 + 3 * k + 2) % 256 AS b
  FROM documents, range(0, 64) t(k)
),
a AS (
  SELECT doc_id, avg(r) AS ar, avg(g) AS ag, avg(b) AS ab,
         avg((r + g + b) / 3.0) AS mg,
         avg(((r + g + b) / 3.0) * ((r + g + b) / 3.0)) AS mg2
  FROM px GROUP BY doc_id
)
SELECT doc_id, 8 AS width, 8 AS height,
       round(ar, 6) AS mean_r, round(ag, 6) AS mean_g, round(ab, 6) AS mean_b,
       round(sqrt(mg2 - mg * mg), 6) AS std_gray
FROM a ORDER BY doc_id"""

def _png_corpus(spark, sf_dir):
    """Same closed-form 8x8 pixels as the PPM fixture, but packed as
    REAL PNG (chunked container, zlib IDAT, per-row filters cycling
    through all five types 0-4) — the decoder must walk chunks,
    inflate and UNFILTER to reproduce the oracle's arithmetic. A bug
    in any filter reconstructor breaks the value hash."""
    import numpy as np
    import pandas as pd

    from ..pipeline.multimodal import encode_png

    def make(batches):
        for pdf in batches:
            imgs = [
                encode_png(((int(d) * 31 + np.arange(192)) % 256)
                           .astype(np.uint8).reshape(8, 8, 3),
                           filters=[0, 1, 2, 3, 4])
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"), "img": imgs})

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return docs.mapInPandas(make, schema="doc_id long, img binary")


def q_png_image_features(spark, sf_dir):
    """REAL PNG decode + feature extraction (pipeline/multimodal.py
    decode_png: chunk walk → zlib inflate → all-five-filters
    unfiltering), then the same Arrow-batched feature kernel as the
    netpbm path."""
    from ..pipeline.multimodal import image_features

    return image_features(_png_corpus(spark, sf_dir), bin_col="img").orderBy("doc_id")


def _gif_corpus(spark, sf_dir):
    """Same closed-form 8x8 pixels as the PPM/PNG fixtures, but packed
    as REAL GIF87a: pixel k of doc d is palette INDEX (d*31+3k)%256
    with palette[j] = (j, (j+1)%256, (j+2)%256), so the decoded RGB is
    exactly the PPM formula — the oracle is unchanged while the ENGINE
    must run the full LZW decode (variable-width codes, dictionary
    rebuild, palette lookup). Any decode bug breaks the value hash."""
    import numpy as np
    import pandas as pd

    from ..pipeline.multimodal import encode_gif

    pal = np.stack(
        [np.arange(256), (np.arange(256) + 1) % 256, (np.arange(256) + 2) % 256],
        axis=1,
    ).astype(np.uint8)

    def make(batches):
        for pdf in batches:
            imgs = [
                encode_gif(((int(d) * 31 + 3 * np.arange(64)) % 256)
                           .astype(np.uint8).reshape(8, 8), pal)
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"), "img": imgs})

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return docs.mapInPandas(make, schema="doc_id long, img binary")


def q_gif_image_features(spark, sf_dir):
    """REAL GIF decode (pipeline/multimodal.py decode_gif: LZW
    variable-width entropy decode + palette lookup) through the same
    Arrow-batched feature kernel as the PPM/PNG/JPEG paths."""
    from ..pipeline.multimodal import image_features

    return image_features(_gif_corpus(spark, sf_dir), bin_col="img").orderBy("doc_id")


def _jpeg_corpus(spark, sf_dir):
    """Deterministic 16x16 grayscale baseline JPEGs: four flat 8x8
    blocks, block k of doc d holding value (d*31 + 59*k) % 256, packed
    by the REAL encoder with a quant table of all 8s. A flat block's
    DCT is DC-only (8*(v-128)) and the DC quant step of 8 makes the
    quantized coefficient exactly v-128, so the decode is EXACT and
    the oracle computes the features arithmetically — while the ENGINE
    must run the full baseline pipeline (marker walk, huffman entropy
    decode with DC prediction, dequant, IDCT) to get the same numbers.
    Any decode bug breaks the value hash."""
    import numpy as np
    import pandas as pd

    from ..pipeline.multimodal import encode_jpeg

    q8 = np.full((8, 8), 8, dtype=np.int64)

    def make(batches):
        for pdf in batches:
            imgs = []
            for d in pdf["doc_id"]:
                px = np.zeros((16, 16), dtype=np.uint8)
                for k in range(4):
                    by, bx = divmod(k, 2)
                    px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (int(d) * 31 + 59 * k) % 256
                imgs.append(encode_jpeg(px, qtab=q8))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"), "img": imgs})

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return docs.mapInPandas(make, schema="doc_id long, img binary")


def q_jpeg_image_features(spark, sf_dir):
    """REAL baseline JPEG decode + feature extraction
    (pipeline/multimodal.py decode_jpeg: huffman entropy decode →
    dequant → IDCT → level shift), then the same Arrow-batched feature
    kernel as the netpbm/PNG paths."""
    from ..pipeline.multimodal import image_features

    return image_features(_jpeg_corpus(spark, sf_dir), bin_col="img").orderBy("doc_id")


# grayscale 16x16, four flat blocks: mean over the 4 block values,
# std over the 4 block values (each repeated 64x, so the per-pixel
# population std equals the per-block one)
_JPEG_FEATURES_SQL = """WITH bl AS (
  SELECT doc_id, (doc_id * 31 + 59 * k) % 256 AS v
  FROM documents, range(0, 4) t(k)
),
a AS (
  SELECT doc_id, avg(v) AS m, avg(v * v) AS m2 FROM bl GROUP BY doc_id
)
SELECT doc_id, 16 AS width, 16 AS height,
       round(m, 6) AS mean_r, round(m, 6) AS mean_g, round(m, 6) AS mean_b,
       round(sqrt(m2 - m * m), 6) AS std_gray
FROM a ORDER BY doc_id"""


ENTRIES.update({
    "image_features": (q_image_features, _IMAGE_FEATURES_SQL),
    # identical oracle: the pixels are the same closed form — only the
    # container (and therefore the engine-side decode work) differs
    "png_image_features": (q_png_image_features, _IMAGE_FEATURES_SQL),
    # identical oracle again: palette indices are chosen so decoded RGB
    # equals the PPM closed form — only the LZW decode work differs
    "gif_image_features": (q_gif_image_features, _IMAGE_FEATURES_SQL),
    "jpeg_image_features": (q_jpeg_image_features, _JPEG_FEATURES_SQL),
})


def _wav_corpus(spark, sf_dir):
    """Deterministic mono s16le WAVs: sample k of doc d is
    ((d*7 + k*13) % 2001) - 1000 — closed-form for the oracle, real
    RIFF bytes for the engine's decoder."""
    import numpy as np
    import pandas as pd

    from ..pipeline.multimodal import encode_wav

    def make(batches):
        for pdf in batches:
            wavs = [
                encode_wav(8000, (((int(d) * 7 + np.arange(256) * 13) % 2001) - 1000)
                           .astype("<i2").reshape(-1, 1))
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"), "audio": wavs})

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return docs.mapInPandas(make, schema="doc_id long, audio binary")


def q_audio_features(spark, sf_dir):
    """REAL audio decode + features: RIFF/PCM parse (decode_wav), RMS +
    zero crossings per doc."""
    from ..pipeline.multimodal import audio_features

    return audio_features(_wav_corpus(spark, sf_dir)).orderBy("doc_id")


_AUDIO_FEATURES_SQL = """WITH s AS (
  SELECT doc_id, k, ((doc_id * 7 + k * 13) % 2001) - 1000 AS v
  FROM documents, range(0, 256) t(k)
),
z AS (
  SELECT doc_id, k, v,
         CASE WHEN (v < 0) <> (lag(v) OVER (PARTITION BY doc_id ORDER BY k) < 0)
              THEN 1 ELSE 0 END AS flip
  FROM s
)
SELECT doc_id, 8000 AS sample_rate, 256::BIGINT AS n_samples,
       round(sqrt(avg(v * v)), 6) AS rms,
       sum(flip)::BIGINT AS zero_crossings
FROM z GROUP BY doc_id ORDER BY doc_id"""


def _video_corpus(spark, sf_dir):
    """Deterministic 6-frame 4x4 'videos' (concatenated raw P6 frames):
    flat byte i of frame f in doc d is (d*11 + f*17 + i) % 256."""
    import numpy as np
    import pandas as pd

    from ..pipeline.multimodal import encode_ppm

    def make(batches):
        for pdf in batches:
            vids = []
            for d in pdf["doc_id"]:
                frames = [
                    encode_ppm(((int(d) * 11 + f * 17 + np.arange(48)) % 256)
                               .astype(np.uint8).reshape(4, 4, 3))
                    for f in range(6)
                ]
                vids.append(b"".join(frames))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"), "video": vids})

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return docs.mapInPandas(make, schema="doc_id long, video binary")


def q_video_frames(spark, sf_dir):
    """REAL frame sampling over a concatenated-PPM stream: every 2nd
    frame decoded, per-frame grayscale mean."""
    from ..pipeline.multimodal import video_frame_features

    return video_frame_features(_video_corpus(spark, sf_dir), every_n=2).orderBy(
        "doc_id", "frame_no"
    )


_VIDEO_FRAMES_SQL = """WITH f AS (
  SELECT doc_id, fr, avg((doc_id * 11 + fr * 17 + i) % 256) AS mg
  FROM documents, unnest([0, 2, 4]) t(fr), range(0, 48) u(i)
  GROUP BY doc_id, fr
)
SELECT doc_id, fr AS frame_no, round(mg, 6) AS mean_gray
FROM f ORDER BY doc_id, frame_no"""

def _flac_corpus(spark, sf_dir):
    """The SAME closed-form samples as the WAV fixture — sample k of
    doc d is ((d*7 + k*13) % 2001) - 1000 — but packed as REAL FLAC
    (STREAMINFO, CRC-verified frame header, fixed-order-2 subframe
    with rice-coded residuals). FLAC is lossless, so the oracle's
    arithmetic needs no error argument: the engine must run the full
    decode (rice → predictor reconstruction) to reproduce the numbers
    exactly. Any decode bug breaks the value hash."""
    import numpy as np
    import pandas as pd

    from ..pipeline.multimodal import encode_flac

    def make(batches):
        for pdf in batches:
            blobs = [
                encode_flac(8000, (((int(d) * 7 + np.arange(256) * 13) % 2001) - 1000)
                            .astype(np.int64).reshape(-1, 1))
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"), "audio": blobs})

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return docs.mapInPandas(make, schema="doc_id long, audio binary")


def q_flac_audio_features(spark, sf_dir):
    """REAL FLAC decode + features (pipeline/multimodal.py decode_flac:
    rice residual decode → fixed-predictor reconstruction, CRC-checked),
    then the same RMS/zero-crossing kernel as the WAV path."""
    from ..pipeline.multimodal import audio_features

    return audio_features(_flac_corpus(spark, sf_dir)).orderBy("doc_id")


ENTRIES.update({
    "audio_features": (q_audio_features, _AUDIO_FEATURES_SQL),
    # identical oracle: lossless codec over the same closed-form
    # samples — only the container (and the decode work) differs
    "flac_audio_features": (q_flac_audio_features, _AUDIO_FEATURES_SQL),
    "video_frame_features": (q_video_frames, _VIDEO_FRAMES_SQL),
})


def q_hist_quantiles(spark, sf_dir):
    """Deterministic histogram-quantile sketch (the order-independent,
    mergeable stand-in for ES's t-digest percentiles): 256 equi-width
    bins, map-side partial agg, only the bin counters reach the
    driver."""
    from ..pipeline.histq import hist_quantiles

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return hist_quantiles(ev, "value", [0.5, 0.95, 0.99])


from ..pipeline.histq import hist_quantiles_sql  # noqa: E402

ENTRIES.update({
    "agg_percentiles_hist": (
        q_hist_quantiles,
        hist_quantiles_sql("value", [0.5, 0.95, 0.99]),
    ),
})
