"""Iterative online-model training — the reference's address-parser
training loop re-expressed for Ray Data (SURVEY §3.3).

The reference trains its averaged perceptron by streaming a file too big
for RAM, re-shuffling it out-of-core every epoch with awk/shuf
(address_parser_train.c:1104-1147, shuffle.c:34-104), applying online
updates, and averaging weights at the end.  The Ray-native shape of that
loop, demonstrated here on a hashed bag-of-words language classifier over
the documents corpus:

  per epoch:
    1. ``ds.random_shuffle(seed=epoch)`` — the out-of-core shuffle IS the
       engine's shuffle (no awk);
    2. ``map_batches(train_block)`` — each block runs the reference's
       sequential online-update rule over its rows and emits ONE
       (weights, n_rows) partial — the per-block Python example loop is
       the algorithm's semantics, and blocks train in parallel;
    3. weighted parameter averaging across blocks (iterative parameter
       mixing, the standard distributed perceptron), result broadcast as
       the next epoch's starting weights;
    4. one streaming eval pass (broadcast weights, vectorized argmax)
       records train accuracy.

Exchange volume per epoch: the shuffle moves (doc_id, lang, text) once,
and each block ships one C x D float32 weight partial (~320 KB) — weights
never shuffle per row.  At 100 TB you shard the shuffle exactly like the
flagship; everything else is already O(blocks).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

import ray
import ray.data

HASH_DIM = 1 << 14  # hashed bag-of-words feature space


def _token_indices(text: str) -> np.ndarray:
    toks = (text or "").lower().split()
    if not toks:
        return np.empty(0, dtype=np.int64)
    return np.fromiter(
        (zlib.crc32(t.encode("utf-8")) % HASH_DIM for t in toks),
        dtype=np.int64,
        count=len(toks),
    )


def _scores(W: np.ndarray, idx: np.ndarray) -> np.ndarray:
    return W[:, idx].sum(axis=1) if idx.shape[0] else np.zeros(W.shape[0])


def train_classifier(
    ds: ray.data.Dataset,
    *,
    text_col: str,
    label_col: str,
    epochs: int = 3,
    seed: int = 7,
) -> "pd.DataFrame":  # noqa: F821
    """Train a hashed-BoW multi-class perceptron to predict ``label_col``
    from ``text_col`` tokens; returns one row per epoch: (epoch,
    accuracy_milli, n_docs).  Rows-only deliverable (block boundaries make
    the online path run-dependent); the pytest contract is accuracy >>
    majority baseline on a learnable corpus."""
    import pandas as pd

    classes = sorted(
        r[label_col] for r in ds.groupby(label_col).count().take_all()
    )
    C = len(classes)
    cls_of = {c: i for i, c in enumerate(classes)}
    W = np.zeros((C, HASH_DIM), dtype=np.float32)

    def train_block(w_ref):
        def f(batch: pa.Table) -> pa.Table:
            Wl = ray.get(w_ref).copy()
            texts = batch[text_col].to_pylist()
            labels = batch[label_col].to_pylist()
            for t, lang in zip(texts, labels):
                idx = _token_indices(t)
                if not idx.shape[0]:
                    continue
                y = cls_of[lang]
                pred = int(np.argmax(_scores(Wl, idx)))
                if pred != y:
                    np.add.at(Wl[y], idx, 1.0)
                    np.add.at(Wl[pred], idx, -1.0)
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
            texts = batch[text_col].to_pylist()
            labels = batch[label_col].to_pylist()
            for t, lang in zip(texts, labels):
                idx = _token_indices(t)
                if idx.shape[0] and int(np.argmax(_scores(Wl, idx))) == cls_of[lang]:
                    correct += 1
            return pa.table(
                {
                    "correct": pa.array([correct], type=pa.int64()),
                    "n": pa.array([batch.num_rows], type=pa.int64()),
                }
            )

        return f

    rows = []
    for epoch in range(epochs):
        w_ref = ray.put(W)
        partials = (
            ds.random_shuffle(seed=seed + epoch)
            .map_batches(train_block(w_ref), batch_format="pyarrow")
            .take_all()
        )
        tot = sum(p["n"] for p in partials)
        W = np.zeros_like(W)
        for p in partials:
            W += (
                np.frombuffer(p["weights"], dtype=np.float32).reshape(C, HASH_DIM)
                * (p["n"] / tot)
            )
        w_ref = ray.put(W)
        ev = (
            ds.map_batches(eval_block(w_ref), batch_format="pyarrow")
            .take_all()
        )
        n = sum(e["n"] for e in ev)
        acc = sum(e["correct"] for e in ev) / max(n, 1)
        rows.append(
            {
                "epoch": epoch,
                "accuracy_milli": int(acc * 1000),
                "n_docs": n,
            }
        )
    return pd.DataFrame(rows)


def train_code_lang(sf_dir: str, epochs: int = 8) -> "pd.DataFrame":  # noqa: F821
    """The registry deliverable: learn the synthetic code corpus' language
    label from content tokens (keywords/syntax make it genuinely
    learnable — the driver documents table's lang column is label noise by
    construction, Bayes accuracy == majority class).  The corpus is the
    deterministic synth generator (same family as the bench headline
    input), cached per size; sf_dir only scales it."""
    import os

    from libpostal_ray.synth import write_synth_corpus

    n = 2000 if "0.001" not in sf_dir else 1000
    path = f"/tmp/libpostal_ray_train/corpus_{n}_5.parquet"
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        write_synth_corpus(path, n_files=n, seed=5)
    ds = ray.data.read_parquet(path, columns=["content", "lang"])
    return train_classifier(ds, text_col="content", label_col="lang", epochs=epochs)
