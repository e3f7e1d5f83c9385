"""Distributed BPE tokenizer training (merge learning) over the corpus.

The classic observation (Sennrich et al. 2016) is that BPE training
never needs the corpus after one pass: merges are learned over the
WORD-FREQUENCY table, which is orders of magnitude smaller than the
text.  The scale shape here:

1. one distributed pass builds (word, n) via the partial-aggregation
   pattern (per-batch Arrow value_counts, tiny groupby-sum) -- the only
   stage that touches the 100-TB corpus;
2. each merge iteration runs over the vocab Dataset: a vectorized
   per-batch pair count (numpy over the flattened symbol array, pandas
   C-speed partial groupby), a tiny groupby(pair)-sum, a top-1 sort, and
   a merge pass that rewrites ONLY the words matched by a vectorized
   substring test (pc.match_substring on the space-joined symbol
   string; space-padded ends make the test exact on symbol boundaries).

All counts are integers, ties break on lexicographic pair order, and
merges apply left-to-right non-overlapping -- so the learned merge table
is bit-identical to the independent serial implementation in
tools/gen_golden.py::gen_bpe_golden regardless of block layout.

Ref semantics: subword-nmt's learn_bpe main loop (public algorithm);
re-expressed as Dataset passes instead of an in-memory heap.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum

EOW = "</w>"  # end-of-word marker, its own symbol


def _word_freqs(sf_dir: str) -> rd.Dataset:
    """(word, n) over documents.text -- lowercase [a-z]+ tokens, the
    same token definition as docs.top_words."""
    from pomp_ray.pipelines.docs import _tokenize_flat

    def partial(t: pa.Table) -> pa.Table:
        flat, _ = _tokenize_flat(t)
        vc = flat.value_counts()
        return pa.table({"word": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    return (rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                            columns=["text"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("word").aggregate(Sum("n", alias_name="n")))


def _to_symbols(t: pa.Table) -> pa.Table:
    """word -> space-padded, space-joined symbol string:
    'hello' -> ' h e l l o </w> '.  Symbols never contain spaces, so a
    ' L R ' substring match is exact on symbol boundaries."""
    syms = [" " + " ".join(list(w) + [EOW]) + " "
            for w in t["word"].to_pylist()]
    return pa.table({"syms": pa.array(syms, pa.string()), "n": t["n"]})


def _pair_partial(t: pa.Table) -> pa.Table:
    """Per-batch (pair, n) partial counts: flatten all symbol lists,
    pair adjacent symbols within the same word (vectorized parent-index
    compare), weight by word frequency, pandas C-speed partial sum."""
    parts = pc.split_pattern(t["syms"], " ")
    flat = pc.list_flatten(parts)
    parent = pc.list_parent_indices(parts)
    keep = pc.not_equal(flat, "")
    flat = flat.filter(keep).to_pandas()
    parent = parent.filter(keep).to_numpy()
    if len(flat) < 2:
        return pa.table({"pair": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    same = parent[:-1] == parent[1:]
    pairs = (flat.iloc[:-1].reset_index(drop=True) + " "
             + flat.iloc[1:].reset_index(drop=True))[same]
    w = t["n"].to_numpy()[parent[:-1][same]]
    df = pd.DataFrame({"pair": pairs.to_numpy(), "n": w})
    out = df.groupby("pair", as_index=False)["n"].sum()
    return pa.Table.from_pandas(out, preserve_index=False).set_column(
        1, "n", pc.cast(pa.array(out["n"]), pa.int64()))


def _apply_merge(left: str, right: str):
    """Batch fn rewriting only words that contain the (left, right)
    bigram: vectorized match gates a left-to-right non-overlapping
    symbol-list merge (the serial BPE rule) on the few matched rows."""
    pat = f" {left} {right} "
    merged = left + right

    def fn(t: pa.Table) -> pa.Table:
        mask = pc.match_substring(t["syms"], pat)
        if not pc.any(mask).as_py():
            return t
        syms = t["syms"].to_pylist()
        idx = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
        for i in idx:
            toks = syms[i].split()
            out, j = [], 0
            while j < len(toks):
                if (toks[j] == left and j + 1 < len(toks)
                        and toks[j + 1] == right):
                    out.append(merged)
                    j += 2
                else:
                    out.append(toks[j])
                    j += 1
            syms[i] = " " + " ".join(out) + " "
        return pa.table({"syms": pa.array(syms, pa.string()),
                         "n": t["n"]})
    return fn


def bpe_merges(sf_dir: str, n_merges: int = 24,
               min_count: int = 2) -> pa.Table:
    """Learn the first ``n_merges`` BPE merges; returns (rank, left,
    right, n) -- the merge table a tokenizer ships.  Stops early when
    the best pair's count drops below ``min_count``.  Oracle: committed
    golden parquet from the independent serial implementation."""
    vocab = _word_freqs(sf_dir).map_batches(
        _to_symbols, batch_format="pyarrow").materialize()
    # the groupby emits one (near-empty) partition per shuffle bucket;
    # every merge iteration re-maps the vocab TWICE, so right-size the
    # block count to the vocab (the iterative-loop lesson: a 31-word
    # vocab over 64 blocks pays 48 x 64 no-op task schedules)
    n_blocks = max(1, min(64, vocab.count() // 2048 + 1))
    if vocab.num_blocks() > 4 * n_blocks:
        vocab = vocab.repartition(n_blocks).materialize()

    ranks, lefts, rights, counts = [], [], [], []
    for rank in range(n_merges):
        # global combine of the per-block partials happens on the
        # driver: the combined pair table is O(active symbol pairs) --
        # bounded by (base alphabet + learned merges)^2, INDEPENDENT of
        # corpus size -- so a pandas reduce here beats spinning a
        # hash-shuffle actor pool per merge iteration (measured 3x).
        # All corpus-scale work stays in pass 1 and the block partials.
        pdf = vocab.map_batches(
            _pair_partial, batch_format="pyarrow").to_pandas()
        if pdf.empty:
            break
        comb = pdf.groupby("pair", as_index=False)["n"].sum() \
            .sort_values(["n", "pair"], ascending=[False, True])
        pair, n = str(comb.iloc[0]["pair"]), int(comb.iloc[0]["n"])
        if n < min_count:
            break
        left, right = pair.split(" ")
        ranks.append(rank)
        lefts.append(left)
        rights.append(right)
        counts.append(n)
        vocab = vocab.map_batches(
            _apply_merge(left, right),
            batch_format="pyarrow").materialize()
    return pa.table({"rank": pa.array(ranks, pa.int64()),
                     "left": pa.array(lefts, pa.string()),
                     "right": pa.array(rights, pa.string()),
                     "n": pa.array(counts, pa.int64())})


class _BpeEncodeStage:
    """Stateful encode stage for ``map_batches``: the learned merge list
    ships once per ACTOR (constructor arg), each actor keeps a
    word -> subtoken-count cache across batches (vocabulary is tiny
    next to the corpus, so the cache converges fast and encoding cost
    amortizes to a dict hit per unique word)."""

    def __init__(self, merges: list):
        self.merges = [tuple(m) for m in merges]
        self._cache: dict = {}

    def _n_sub(self, w: str) -> int:
        c = self._cache.get(w)
        if c is None:
            s = list(w) + [EOW]
            for left, right in self.merges:
                if left not in s or right not in s:
                    continue
                out, j = [], 0
                while j < len(s):
                    if (s[j] == left and j + 1 < len(s)
                            and s[j + 1] == right):
                        out.append(left + right)
                        j += 2
                    else:
                        out.append(s[j])
                        j += 1
                s = out
            c = len(s)
            self._cache[w] = c
        return c

    def __call__(self, t: pa.Table) -> pa.Table:
        from pomp_ray.pipelines.docs import _tokenize_flat

        flat, parent = _tokenize_flat(t)
        n = t.num_rows
        fl = flat.to_numpy(zero_copy_only=False)
        par = parent.to_numpy()
        cnt = np.zeros(n, np.int64)
        if len(fl):
            uniq, inv = np.unique(fl, return_inverse=True)
            lens = np.array([self._n_sub(w) for w in uniq], np.float64)
            cnt = np.bincount(par, weights=lens[inv],
                              minlength=n).astype(np.int64)
        return pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "n_tokens_bpe": pa.array(cnt, pa.int64())})


def bpe_token_counts(sf_dir: str, n_merges: int = 24) -> rd.Dataset:
    """Apply the learned BPE merges to the corpus: per-doc subword token
    counts (doc_id, n_tokens_bpe) -- the tokenizer-apply half that
    completes the train half above.  Merges apply per word in rank
    order, left-to-right non-overlapping (the serial Sennrich encode
    rule), so counts are exact integers and the output is bit-identical
    to the independent serial golden regardless of block layout.  The
    merge table (O(n_merges) strings) is the only broadcast; text never
    crosses a shuffle."""
    m = bpe_merges(sf_dir, n_merges=n_merges)
    merges = list(zip(m["left"].to_pylist(), m["right"].to_pylist()))
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"]) \
        .map_batches(_BpeEncodeStage, fn_constructor_args=(merges,),
                     concurrency=(1, 16), batch_format="pyarrow")


class _BpeIdsStage:
    """Stateful encode-to-ids stage: vocabulary is deterministic --
    ids 0..25 = 'a'..'z', 26 = '</w>', 27+rank = merge `rank`'s merged
    symbol -- so the SAME merge table always yields the SAME ids,
    across sessions and engines.  Per-actor word -> ids cache; the
    per-doc ragged id concatenation is a vectorized gather (offsets
    arithmetic), not a Python loop over tokens."""

    def __init__(self, merges: list, n_shards: int = 16):
        self.merges = [tuple(m) for m in merges]
        self.n_shards = n_shards
        self.vocab = {c: i for i, c in
                      enumerate("abcdefghijklmnopqrstuvwxyz")}
        self.vocab[EOW] = 26
        for r, (left, right) in enumerate(self.merges):
            self.vocab[left + right] = 27 + r
        self._cache: dict = {}

    def _ids(self, w: str) -> np.ndarray:
        c = self._cache.get(w)
        if c is None:
            s = list(w) + [EOW]
            for left, right in self.merges:
                if left not in s or right not in s:
                    continue
                out, j = [], 0
                while j < len(s):
                    if (s[j] == left and j + 1 < len(s)
                            and s[j + 1] == right):
                        out.append(left + right)
                        j += 2
                    else:
                        out.append(s[j])
                        j += 1
                s = out
            c = np.array([self.vocab[x] for x in s], np.int32)
            self._cache[w] = c
        return c

    def __call__(self, t: pa.Table) -> pa.Table:
        from pomp_ray.pipelines.docs import _shard_ids, _tokenize_flat

        doc_ids = t["doc_id"].to_pylist()
        shard = _shard_ids(doc_ids, self.n_shards)
        flat, parent = _tokenize_flat(t)
        n = t.num_rows
        fl = flat.to_numpy(zero_copy_only=False)
        par = parent.to_numpy()
        if len(fl):
            uniq, inv = np.unique(fl, return_inverse=True)
            enc = [self._ids(w) for w in uniq]
            lens = np.array([len(e) for e in enc], np.int64)
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            big = np.concatenate(enc)
            # ragged gather: token j contributes big[starts[inv[j]] ..
            # +lens[inv[j]]]; flat/parent are in doc order, so the
            # concatenation below is each doc's ids in reading order
            tl = lens[inv]
            pos = (np.repeat(starts[inv], tl)
                   + np.arange(tl.sum()) - np.repeat(
                       np.concatenate([[0], np.cumsum(tl)[:-1]]), tl))
            all_ids = big[pos]
            per_doc = np.bincount(par, weights=tl, minlength=n) \
                .astype(np.int64)
        else:
            all_ids = np.array([], np.int32)
            per_doc = np.zeros(n, np.int64)
        offsets = np.concatenate([[0], np.cumsum(per_doc)]).astype(np.int32)
        ids_col = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(all_ids, pa.int32()))
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "shard": pa.array(shard, pa.int64()),
            "ids": ids_col,
            "n_tokens": pa.array(per_doc, pa.int64())})


def tokenized_docs(sf_dir: str, n_merges: int = 24,
                   n_shards: int = 16) -> rd.Dataset:
    """The training-ready export: (doc_id, shard, ids list<int32>,
    n_tokens) -- each doc BPE-encoded to token ids under the
    deterministic vocabulary (see _BpeIdsStage), md5-bucket sharded
    (pure per-row assignment: resumable, retry-stable).  ids lengths
    equal bpe_token_counts exactly (same encode)."""
    m = bpe_merges(sf_dir, n_merges=n_merges)
    merges = list(zip(m["left"].to_pylist(), m["right"].to_pylist()))
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"]) \
        .map_batches(_BpeIdsStage, fn_constructor_args=(merges, n_shards),
                     concurrency=(1, 16), batch_format="pyarrow")


def tokenized_shard_stats(sf_dir: str, n_merges: int = 24,
                          n_shards: int = 16) -> rd.Dataset:
    """Per-shard (n_docs, n_tokens) over the tokenized export -- the
    shard-balance report a training run reads.  Partial-agg per batch,
    tiny final groupby; the ids themselves never shuffle."""
    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"shard": t["shard"].to_numpy(),
                           "n_tokens": t["n_tokens"].to_numpy()})
        g = df.groupby("shard", as_index=False).agg(
            n_docs=("n_tokens", "size"), n_tokens=("n_tokens", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = tokenized_docs(sf_dir, n_merges, n_shards) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("shard").aggregate(Sum("n_docs", alias_name="n_docs"),
                                    Sum("n_tokens", alias_name="n_tokens"))
    return out.map_batches(
        lambda t: pa.table({c: pc.cast(t[c], pa.int64())
                            for c in ("shard", "n_docs", "n_tokens")}),
        batch_format="pyarrow")


def write_tokenized_shards(sf_dir: str, out_dir: str, n_merges: int = 24,
                           n_shards: int = 16) -> dict:
    """Write the tokenized corpus as shard-partitioned parquet
    (shard=NN dirs via partition_cols): a failed run re-writes only
    unfinished shards, a trainer reads one dir per data-parallel rank.
    Returns {shard: n_docs}."""
    import collections

    ds = tokenized_docs(sf_dir, n_merges, n_shards)
    ds.write_parquet(out_dir, partition_cols=["shard"],
                     mode="overwrite")
    counts = collections.Counter()
    for b in rd.read_parquet(out_dir, columns=["shard"]) \
            .iter_batches(batch_format="pyarrow"):
        for s, n in zip(*np.unique(np.asarray(b["shard"], np.int64),
                                   return_counts=True)):
            counts[int(s)] += int(n)
    return dict(counts)


def _unigram_candidates(wf: rd.Dataset, max_len: int = 4,
                        top_m: int = 48) -> list[tuple[str, int]]:
    """Candidate piece table: every substring of length <= max_len,
    weighted by word frequency, counted DISTRIBUTED over the word-freq
    Dataset (the per-batch loop is vocab-bounded, never corpus-bounded;
    the combined table is bounded by |alphabet|^max_len regardless of
    corpus size).  Returns single chars (always kept -- they guarantee
    segmentability) plus the top_m multi-char substrings by
    (count desc, piece asc)."""
    def partial(t: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for w, n in zip(t["word"].to_pylist(), t["n"].to_pylist()):
            for L in range(1, max_len + 1):
                for i in range(len(w) - L + 1):
                    s = w[i:i + L]
                    counts[s] = counts.get(s, 0) + int(n)
        return pa.table({"piece": pa.array(list(counts), pa.string()),
                         "n": pa.array(list(counts.values()), pa.int64())})

    rows = wf.map_batches(partial, batch_format="pyarrow") \
        .groupby("piece").aggregate(Sum("n", alias_name="n")).take_all()
    chars = [(r["piece"], int(r["n"])) for r in rows
             if len(r["piece"]) == 1]
    multi = sorted(((r["piece"], int(r["n"])) for r in rows
                    if len(r["piece"]) > 1),
                   key=lambda x: (-x[1], x[0]))[:top_m]
    return sorted(chars) + sorted(multi)


def unigram_viterbi(word: str, logp: dict, max_len: int = 4) -> list[str]:
    """Deterministic Viterbi segmentation: maximize the sum of piece
    log-probs; dp runs left to right, candidates scan j from i-max_len
    upward, STRICT improvement required (ties keep the earliest j =
    longest last piece).  The golden reimplements this contract
    independently (tools/gen_golden.py) -- the pinned arithmetic is the
    single float addition dp[j] + logp per candidate, identical on both
    sides, so the argmax is bit-identical."""
    NEG = float("-inf")
    n = len(word)
    dp = [NEG] * (n + 1)
    back = [0] * (n + 1)
    dp[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None or dp[j] == NEG:
                continue
            cand = dp[j] + lp
            if cand > dp[i]:
                dp[i] = cand
                back[i] = j
    pieces = []
    i = n
    while i > 0:
        j = back[i]
        pieces.append(word[j:i])
        i = j
    return pieces[::-1]


def unigram_lm_vocab(sf_dir: str, n_iters: int = 3, max_len: int = 4,
                     top_m: int = 48) -> pa.Table:
    """SentencePiece-style unigram LM tokenizer training (Kudo 2018,
    hard-EM/Viterbi variant) -- the second real-world tokenizer trainer
    beside BPE.  Returns the final piece table (piece, n, prob_ppb).

    Scale shape mirrors bpe_merges: ONE distributed corpus pass builds
    the word-frequency table; candidate counting is a second distributed
    pass over that (bounded) table; each EM iteration is a distributed
    Viterbi-count pass over the word table with the model BROADCAST
    (ray.put) and per-piece count partials reduced by a tiny groupby.
    Determinism: the model is integer ppb probabilities (count * 1e9 //
    total), Viterbi scores are log(ppb_int) floats computed identically
    on every worker, and count sums are integers -- so the trained
    vocab is bit-identical to tools/gen_golden.py::gen_unigram_golden
    regardless of block structure.  Single-char pieces keep a count
    floor of 1 so every word stays segmentable."""
    import math

    import ray as _ray

    wf = _word_freqs(sf_dir).materialize()
    cands = _unigram_candidates(wf, max_len=max_len, top_m=top_m)
    counts = {p: n for p, n in cands}

    for _ in range(n_iters):
        total = sum(counts.values())
        ppb = {p: n * 1_000_000_000 // total for p, n in counts.items()
               if n > 0}
        logz = math.log(sum(ppb.values()))
        logp = {p: math.log(v) - logz for p, v in ppb.items() if v > 0}
        ref = _ray.put(logp)

        def count_partial(t: pa.Table, _ml=max_len) -> pa.Table:
            lp = _ray.get(ref)
            acc: dict[str, int] = {}
            for w, n in zip(t["word"].to_pylist(), t["n"].to_pylist()):
                for piece in unigram_viterbi(w, lp, _ml):
                    acc[piece] = acc.get(piece, 0) + int(n)
            return pa.table({"piece": pa.array(list(acc), pa.string()),
                             "n": pa.array(list(acc.values()),
                                           pa.int64())})

        rows = wf.map_batches(count_partial, batch_format="pyarrow") \
            .groupby("piece").aggregate(Sum("n", alias_name="n")) \
            .take_all()
        new_counts = {r["piece"]: int(r["n"]) for r in rows}
        # char floor keeps the base alphabet alive
        for p in counts:
            if len(p) == 1:
                new_counts[p] = max(new_counts.get(p, 0), 1)
        counts = {p: n for p, n in new_counts.items() if n > 0}

    total = sum(counts.values())
    pieces = sorted(counts)
    return pa.table({
        "piece": pa.array(pieces, pa.string()),
        "n": pa.array([counts[p] for p in pieces], pa.int64()),
        "prob_ppb": pa.array([counts[p] * 1_000_000_000 // total
                              for p in pieces], pa.int64())})
