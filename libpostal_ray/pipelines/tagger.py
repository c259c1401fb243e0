"""Per-token sequence tagger — the address-parser training analog.

The reference's largest trained subsystem is a per-token greedy averaged
perceptron: each token is classified using hashed features of the token,
its neighbors, and the PREVIOUS PREDICTED TAG, decoding left-to-right
(address_parser.c:1645-1839; training loop address_parser_train.c).  This
module re-expresses that exact shape for Ray Data on a code-native task:
license-header span tagging (is this token inside the license/copyright
header or in code?) — the same sequence-labeling mechanics, a different
label set.

Physical plan per epoch (the SURVEY §3.3 pattern, same as train.py):

  1. ``random_shuffle(seed=epoch)`` — the reference's out-of-core shuffle;
  2. ``map_batches(train_block)`` — greedy left-to-right online updates
     over each doc in the block (the sequential inner loop IS the
     algorithm; blocks train in parallel), ONE (weights, n) partial out;
  3. weighted parameter averaging (iterative parameter mixing);
  4. streaming held-out eval with broadcast weights.

Exchange: the shuffle moves token sequences once per epoch; each block
ships one (2 x D) float32 partial (~128 KB).  Weights never shuffle per
row.  Scoring (``tag_tokens``) is one stateless broadcast map.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

import ray
import ray.data

TAG_DIM = 1 << 14
TAGS = ("code", "license")  # index IS the class id
_T2I = {t: i for i, t in enumerate(TAGS)}


def _feat_indices(toks: list[str], i: int, prev_tag: int) -> np.ndarray:
    """Hashed feature ids for token i: identity, prev/next token, position
    bucket, and the previous PREDICTED tag (the greedy-decode feature that
    makes this a sequence model, not a pointwise classifier)."""
    t = toks[i]
    feats = (
        "w=" + t,
        "p=" + (toks[i - 1] if i else "<s>"),
        "n=" + (toks[i + 1] if i + 1 < len(toks) else "</s>"),
        "pos=" + str(min(i // 8, 7)),
        "pt=" + str(prev_tag),
        "pt+w=" + str(prev_tag) + "|" + t,
    )
    return np.fromiter(
        (zlib.crc32(f.encode()) % TAG_DIM for f in feats),
        dtype=np.int64,
        count=len(feats),
    )


def _greedy_decode(W: np.ndarray, toks: list[str]) -> np.ndarray:
    out = np.zeros(len(toks), dtype=np.int64)
    prev = 0
    for i in range(len(toks)):
        idx = _feat_indices(toks, i, prev)
        prev = int(np.argmax(W[:, idx].sum(axis=1)))
        out[i] = prev
    return out


def train_tagger(
    train: ray.data.Dataset,
    heldout: ray.data.Dataset,
    *,
    tokens_col: str = "tokens",
    tags_col: str = "tags",
    epochs: int = 3,
    seed: int = 11,
) -> "pd.DataFrame":  # noqa: F821
    """Train the greedy per-token perceptron; returns one row per epoch:
    (epoch, heldout_accuracy_milli, n_tokens).  Rows-only deliverable
    (block boundaries make online updates run-dependent); the pytest
    contract is held-out token accuracy >> majority baseline."""
    import pandas as pd

    C = len(TAGS)
    W = np.zeros((C, TAG_DIM), dtype=np.float32)

    def train_block(w_ref):
        def f(batch: pa.Table) -> pa.Table:
            Wl = ray.get(w_ref).copy()
            toks_c = batch[tokens_col].to_pylist()
            tags_c = batch[tags_col].to_pylist()
            for toks, tags in zip(toks_c, tags_c):
                if not toks:
                    continue
                prev = 0  # decode with PREDICTED history (the reference's
                for i in range(len(toks)):  # greedy training regime)
                    idx = _feat_indices(toks, i, prev)
                    pred = int(np.argmax(Wl[:, idx].sum(axis=1)))
                    y = _T2I[tags[i]]
                    if pred != y:
                        np.add.at(Wl[y], idx, 1.0)
                        np.add.at(Wl[pred], idx, -1.0)
                    prev = pred
            return pa.table(
                {
                    "weights": pa.array([Wl.tobytes()], type=pa.large_binary()),
                    "n": pa.array([batch.num_rows], type=pa.int64()),
                }
            )

        return f

    def eval_block(w_ref):
        def f(batch: pa.Table) -> pa.Table:
            Wl = ray.get(w_ref)
            correct = 0
            total = 0
            for toks, tags in zip(
                batch[tokens_col].to_pylist(), batch[tags_col].to_pylist()
            ):
                if not toks:
                    continue
                pred = _greedy_decode(Wl, toks)
                gold = np.fromiter(
                    (_T2I[t] for t in tags), dtype=np.int64, count=len(tags)
                )
                correct += int((pred == gold).sum())
                total += len(toks)
            return pa.table(
                {
                    "correct": pa.array([correct], type=pa.int64()),
                    "n": pa.array([total], type=pa.int64()),
                }
            )

        return f

    rows = []
    for epoch in range(epochs):
        w_ref = ray.put(W)
        partials = (
            train.random_shuffle(seed=seed + epoch)
            .map_batches(train_block(w_ref), batch_format="pyarrow")
            .take_all()
        )
        tot = sum(p["n"] for p in partials) or 1
        W = np.zeros_like(W)
        for p in partials:
            W += np.frombuffer(p["weights"], dtype=np.float32).reshape(
                C, TAG_DIM
            ) * (p["n"] / tot)
        w_ref = ray.put(W)
        ev = heldout.map_batches(eval_block(w_ref), batch_format="pyarrow").take_all()
        n = sum(e["n"] for e in ev)
        acc = sum(e["correct"] for e in ev) / max(n, 1)
        rows.append(
            {"epoch": epoch, "heldout_accuracy_milli": int(acc * 1000), "n_tokens": n}
        )
    return pd.DataFrame(rows), W


def tag_tokens(
    ds: ray.data.Dataset, W: np.ndarray, *, tokens_col: str = "tokens"
) -> ray.data.Dataset:
    """Score pass: (doc_id, tokens) -> (doc_id, tags list<string>) with the
    broadcast trained weights (ray.put once, read per task)."""
    w_ref = ray.put(W)

    def f(batch: pa.Table) -> pa.Table:
        Wl = ray.get(w_ref)
        out = [
            [TAGS[j] for j in _greedy_decode(Wl, toks or [])]
            for toks in batch[tokens_col].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "tags": pa.array(out, type=pa.list_(pa.string())),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Linear-chain CRF layer — the reference's OTHER decoder (crf.c:100-108
# scores state + state-transition features; crf_context.c holds the
# Viterbi lattice).  Re-expressed from scratch: emission weights over the
# same hashed templates (minus the prev-tag features — transitions model
# that dependency exactly), a dense C x C transition matrix, EXACT Viterbi
# decode, and structured-perceptron training (decode, then +1 gold path /
# -1 predicted path on every emission and transition along the paths) in
# the same per-epoch shuffle + per-block online updates + weighted
# parameter averaging loop as the greedy tagger above.
# ---------------------------------------------------------------------------


def _static_feat_indices(toks: list[str], i: int) -> np.ndarray:
    """The greedy tagger's templates WITHOUT the prev-tag features (the
    transition matrix carries that dependency in the CRF)."""
    t = toks[i]
    feats = (
        "w=" + t,
        "p=" + (toks[i - 1] if i else "<s>"),
        "n=" + (toks[i + 1] if i + 1 < len(toks) else "</s>"),
        "pos=" + str(min(i // 8, 7)),
    )
    return np.fromiter(
        (zlib.crc32(f.encode()) % TAG_DIM for f in feats),
        dtype=np.int64,
        count=len(feats),
    )


def _pt_feat_indices(toks: list[str], i: int, prev_tag: int) -> np.ndarray:
    """Transition-conditioned emission features ("pt=", "pt+w=") — the
    greedy tagger's prev-tag templates, scored EXACTLY inside Viterbi
    (crf.c's state-transition features): the CRF's feature set is a
    strict superset of the greedy model's."""
    feats = (
        "pt=" + str(prev_tag),
        "pt+w=" + str(prev_tag) + "|" + toks[i],
        # neighbor conjunctions: let the model score span boundaries per
        # transition (the global decode otherwise trades the last
        # in-span token off against its next-word feature)
        "pt+p=" + str(prev_tag) + "|" + (toks[i - 1] if i else "<s>"),
        "pt+n=" + str(prev_tag) + "|"
        + (toks[i + 1] if i + 1 < len(toks) else "</s>"),
    )
    return np.fromiter(
        (zlib.crc32(f.encode()) % TAG_DIM for f in feats),
        dtype=np.int64,
        count=len(feats),
    )


def _viterbi_decode(W: np.ndarray, T: np.ndarray, toks: list[str]) -> np.ndarray:
    """Exact max-score path through the (len(toks) x C) lattice.
    score(i, prev, y) = W[y, static(i)].sum + W[y, pt(i, prev)].sum
    + T[prev, y]; row 0 conditions on the implicit start state prev=0
    (the greedy decoder's convention, crf_context.c's start case)."""
    n = len(toks)
    C = W.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    delta = np.empty((n, C), dtype=np.float64)
    back = np.zeros((n, C), dtype=np.int64)
    delta[0] = (
        W[:, _static_feat_indices(toks, 0)].sum(axis=1)
        + W[:, _pt_feat_indices(toks, 0, 0)].sum(axis=1)
    )
    for i in range(1, n):
        em = W[:, _static_feat_indices(toks, i)].sum(axis=1)
        # scores[prev, y] = delta[prev] + T[prev, y] + W[y, pt(i, prev)]
        scores = delta[i - 1][:, None] + T
        for prev in range(C):
            scores[prev] += W[:, _pt_feat_indices(toks, i, prev)].sum(axis=1)
        back[i] = np.argmax(scores, axis=0)
        delta[i] = scores[back[i], np.arange(C)] + em
    out = np.empty(n, dtype=np.int64)
    out[-1] = int(np.argmax(delta[-1]))
    for i in range(n - 1, 0, -1):
        out[i - 1] = back[i, out[i]]
    return out


def _crf_update_path(
    W: np.ndarray, T: np.ndarray, toks: list[str], gold: np.ndarray,
    pred: np.ndarray,
) -> None:
    """Structured-perceptron update: +1 along the gold path, -1 along the
    predicted path (static emissions, prev-tag-conditioned emissions, and
    transitions); identical (prev, y) steps cancel exactly."""
    for i in range(len(toks)):
        g, p = int(gold[i]), int(pred[i])
        gprev = int(gold[i - 1]) if i else 0
        pprev = int(pred[i - 1]) if i else 0
        if g != p or gprev != pprev:
            idx = _static_feat_indices(toks, i)
            np.add.at(W[g], idx, 1.0)
            np.add.at(W[p], idx, -1.0)
            np.add.at(W[g], _pt_feat_indices(toks, i, gprev), 1.0)
            np.add.at(W[p], _pt_feat_indices(toks, i, pprev), -1.0)
        if i and (gprev, g) != (pprev, p):
            T[gprev, g] += 1.0
            T[pprev, p] -= 1.0


def train_crf_tagger(
    train: ray.data.Dataset,
    heldout: ray.data.Dataset,
    *,
    tokens_col: str = "tokens",
    tags_col: str = "tags",
    epochs: int = 3,
    seed: int = 11,
):
    """Linear-chain CRF via distributed structured perceptron: per epoch,
    ``random_shuffle(seed=epoch)`` -> per-block Viterbi-decode-and-update
    -> weighted averaging of (W, T) partials (iterative parameter
    mixing) -> streaming held-out eval with the broadcast parameters.
    Returns (per-epoch DataFrame, W, T)."""
    import pandas as pd

    C = len(TAGS)
    W = np.zeros((C, TAG_DIM), dtype=np.float32)
    T = np.zeros((C, C), dtype=np.float32)

    def train_block(w_ref, t_ref):
        def f(batch: pa.Table) -> pa.Table:
            Wl = ray.get(w_ref).astype(np.float64).copy()
            Tl = ray.get(t_ref).astype(np.float64).copy()
            # within-block AVERAGED structured perceptron (the
            # reference's crf_averaged_perceptron regime): the partial
            # shipped out is the mean of the per-sequence weight
            # snapshots, which suppresses the last-sequences' thrash
            Wsum = np.zeros_like(Wl)
            Tsum = np.zeros_like(Tl)
            n_seq = 0
            for toks, tags in zip(
                batch[tokens_col].to_pylist(), batch[tags_col].to_pylist()
            ):
                if not toks:
                    continue
                gold = np.fromiter(
                    (_T2I[t] for t in tags), dtype=np.int64, count=len(tags)
                )
                pred = _viterbi_decode(Wl, Tl, toks)
                if not np.array_equal(pred, gold):
                    _crf_update_path(Wl, Tl, toks, gold, pred)
                Wsum += Wl
                Tsum += Tl
                n_seq += 1
            if n_seq:
                Wl, Tl = Wsum / n_seq, Tsum / n_seq
            return pa.table(
                {
                    "weights": pa.array(
                        [Wl.astype(np.float32).tobytes()], type=pa.large_binary()
                    ),
                    "trans": pa.array(
                        [Tl.astype(np.float32).tobytes()], type=pa.large_binary()
                    ),
                    "n": pa.array([batch.num_rows], type=pa.int64()),
                }
            )

        return f

    def eval_block(w_ref, t_ref):
        def f(batch: pa.Table) -> pa.Table:
            Wl = ray.get(w_ref)
            Tl = ray.get(t_ref)
            correct = 0
            total = 0
            for toks, tags in zip(
                batch[tokens_col].to_pylist(), batch[tags_col].to_pylist()
            ):
                if not toks:
                    continue
                pred = _viterbi_decode(Wl, Tl, toks)
                gold = np.fromiter(
                    (_T2I[t] for t in tags), dtype=np.int64, count=len(tags)
                )
                correct += int((pred == gold).sum())
                total += len(toks)
            return pa.table(
                {
                    "correct": pa.array([correct], type=pa.int64()),
                    "n": pa.array([total], type=pa.int64()),
                }
            )

        return f

    rows = []
    for epoch in range(epochs):
        w_ref, t_ref = ray.put(W), ray.put(T)
        partials = (
            train.random_shuffle(seed=seed + epoch)
            .map_batches(train_block(w_ref, t_ref), batch_format="pyarrow")
            .take_all()
        )
        tot = sum(p["n"] for p in partials) or 1
        W = np.zeros_like(W)
        T = np.zeros_like(T)
        for p in partials:
            W += np.frombuffer(p["weights"], dtype=np.float32).reshape(
                C, TAG_DIM
            ) * (p["n"] / tot)
            T += np.frombuffer(p["trans"], dtype=np.float32).reshape(C, C) * (
                p["n"] / tot
            )
        w_ref, t_ref = ray.put(W), ray.put(T)
        ev = heldout.map_batches(
            eval_block(w_ref, t_ref), batch_format="pyarrow"
        ).take_all()
        n = sum(e["n"] for e in ev)
        acc = sum(e["correct"] for e in ev) / max(n, 1)
        rows.append(
            {"epoch": epoch, "heldout_accuracy_milli": int(acc * 1000), "n_tokens": n}
        )
    return pd.DataFrame(rows), W, T


def tag_tokens_crf(
    ds: ray.data.Dataset,
    W: np.ndarray,
    T: np.ndarray,
    *,
    tokens_col: str = "tokens",
) -> ray.data.Dataset:
    """Viterbi score pass: (doc_id, tokens) -> (doc_id, tags) with the
    broadcast trained (W, T) — ray.put once, read per task."""
    w_ref, t_ref = ray.put(W), ray.put(T)

    def f(batch: pa.Table) -> pa.Table:
        Wl, Tl = ray.get(w_ref), ray.get(t_ref)
        out = [
            [TAGS[j] for j in _viterbi_decode(Wl, Tl, toks or [])]
            for toks in batch[tokens_col].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "tags": pa.array(out, type=pa.list_(pa.string())),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Synthetic labeled corpus: license-header spans over code-like docs
# ---------------------------------------------------------------------------

_LICENSE_VOCAB = (
    "copyright (c) holder all rights reserved permission is hereby granted "
    "free of charge to any person obtaining a copy of this software and "
    "associated documentation files the software to deal without "
    "restriction including limitation merge publish distribute sublicense "
    "sell copies provided that notice shall be included in substantial "
    "portions warranty of any kind express or implied"
).split()

_CODE_VOCAB = (
    "def return if else for while import from class self none true false "
    "lambda yield assert raise try except finally with as pass break "
    "continue print range len list dict set tuple int str float append "
    "items keys values index count sort join split strip replace format"
).split()


def synth_tagged_corpus(
    n_docs: int = 400, seed: int = 13, head_leak: float = 0.05
) -> pa.Table:
    """(doc_id, tokens, tags): each doc opens with a license-vocab header
    span then code-vocab body; a few body tokens leak license words AND
    vice versa (symmetric ~5% leakage) so the tagger must use CONTEXT,
    not token identity alone.  Round-5 note: the head leak was previously
    documented but not implemented — the one-way corpus structurally
    favored the greedy left-to-right decoder (a leaked head token never
    corrupted its predicted history); the symmetric corpus is the honest
    sequence-labeling benchmark, and on it exact Viterbi decoding beats
    greedy (pinned by test_crf_viterbi_beats_or_matches_greedy)."""
    rng = np.random.default_rng(seed)
    ids, toks_all, tags_all = [], [], []
    for d in range(n_docs):
        hn = int(rng.integers(8, 30))
        bn = int(rng.integers(20, 80))
        head = [str(rng.choice(_LICENSE_VOCAB)) for _ in range(hn)]
        body = [str(rng.choice(_CODE_VOCAB)) for _ in range(bn)]
        # cross-vocabulary leakage: ~5% of body tokens are license words
        for i in range(len(body)):
            if rng.random() < 0.05:
                body[i] = str(rng.choice(_LICENSE_VOCAB))
        # ... and ~5% of head tokens are code words (symmetric)
        for i in range(len(head)):
            if rng.random() < head_leak:
                head[i] = str(rng.choice(_CODE_VOCAB))
        toks = head + body
        tags = ["license"] * hn + ["code"] * bn
        ids.append(d)
        toks_all.append(toks)
        tags_all.append(tags)
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "tokens": pa.array(toks_all, type=pa.list_(pa.string())),
            "tags": pa.array(tags_all, type=pa.list_(pa.string())),
        }
    )


def license_tagger(sf_dir: str, epochs: int = 3) -> "pd.DataFrame":  # noqa: F821
    """Registry deliverable (rows-only): train on the deterministic
    synthetic tagged corpus (doc_id %% 5 != 0), evaluate held-out token
    accuracy (doc_id %% 5 == 0) per epoch.  sf_dir only scales the corpus
    (same convention as train_code_lang)."""
    n = 200 if "0.001" in sf_dir else 400
    t = synth_tagged_corpus(n_docs=n, seed=13)
    ds = ray.data.from_arrow(t)

    def _split(keep_mod0: bool):
        def f(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            mask = (ids % 5 == 0) if keep_mod0 else (ids % 5 != 0)
            return batch.filter(pa.array(mask))

        return f

    train = ds.map_batches(_split(False), batch_format="pyarrow")
    heldout = ds.map_batches(_split(True), batch_format="pyarrow")
    df, _W = train_tagger(train, heldout, epochs=epochs)
    return df


def license_tagger_crf(sf_dir: str, epochs: int = 3) -> "pd.DataFrame":  # noqa: F821
    """Registry deliverable (rows-only): the CRF/Viterbi counterpart of
    ``license_tagger`` — same corpus, same split, same per-epoch loop;
    the held-out accuracy column lets the fixture pin CRF >= greedy."""
    n = 200 if "0.001" in sf_dir else 400
    t = synth_tagged_corpus(n_docs=n, seed=13)
    ds = ray.data.from_arrow(t)

    def _split(keep_mod0: bool):
        def f(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            mask = (ids % 5 == 0) if keep_mod0 else (ids % 5 != 0)
            return batch.filter(pa.array(mask))

        return f

    train = ds.map_batches(_split(False), batch_format="pyarrow")
    heldout = ds.map_batches(_split(True), batch_format="pyarrow")
    df, _W, _T = train_crf_tagger(train, heldout, epochs=epochs)
    return df
