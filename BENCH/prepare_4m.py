"""Round-3 verdict #9: prepare_training_corpus AT SCALE, LM gate on.

Adapts the cached 4M-file code corpus into the documents shape the prepare
pipeline reads (doc_id, text, lang, source), then runs the full composed
pipeline — near-dup dedup -> Gopher quality gate -> CCNet-style LM
perplexity gate -> redaction — as ONE job, recording wall and the keep/drop
split.  The adaptation write is excluded from the timed window.

Usage:
    python BENCH/prepare_4m.py [--n 4000000] [--lm-gate-bits 6.0]
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4_000_000)
    ap.add_argument("--lm-gate-bits", type=float, default=6.0)
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    corpus = f"/tmp/libpostal_ray_bench/corpus_{args.n}_42.parquet"
    docs_dir = f"/tmp/prepare_{args.n}"
    docs_path = f"{docs_dir}/documents.parquet"

    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=args.num_cpus, include_dashboard=False
        )

    if not os.path.exists(docs_path):
        import pyarrow as pa

        def adapt(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "text": batch["content"],
                    "lang": batch["lang"],
                    "source": batch["repo"],
                }
            )

        from libpostal_ray.sources.readers import read_code_corpus

        os.makedirs(docs_dir, exist_ok=True)
        read_code_corpus(corpus).map_batches(
            adapt, batch_format="pyarrow"
        ).write_parquet(docs_path)

    from libpostal_ray.pipelines.prepare import prepare_training_corpus

    # the default gate thresholds are prose-tuned (quality_filter parity:
    # 20-80 words, >=82% alpha) and drop EVERY 40-line code file; code
    # needs a wide word band and a lower alpha floor
    code_quality = ((5, 100_000), (1, 10), (40, 100))

    t0 = time.perf_counter()
    out = prepare_training_corpus(
        docs_dir, lm_gate_bits=args.lm_gate_bits, quality=code_quality
    )
    n_kept = out.count()
    wall = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "metric": "prepare_training_corpus_at_scale",
                "n_input": args.n,
                "n_kept": n_kept,
                "lm_gate_bits": args.lm_gate_bits,
                "wall_sec": round(wall, 3),
                "files_per_sec": round(args.n / wall, 1),
                "num_cpus": args.num_cpus,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
