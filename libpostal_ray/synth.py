"""Deterministic synthetic source-code corpus with seeded duplicate families.

Produces the input table shape from BASELINE.json input_hint:
  (repo: string, path: string, commit: string, lang: string, content: string)

Duplicate families mirror the mutation classes the reference is built to
catch for addresses (abbreviations, ordinal/whitespace/case variation —
test_expand.c fixtures):
  * exact copies                (EXACT duplicates — sha256-equal)
  * whitespace/comment edits    (canonical-form-equal or near-equal)
  * identifier renames          (high-Jaccard near-duplicates)
  * vendored copies             (same content in many repos -> hot LSH buckets,
                                 the skew case SURVEY.md section 4 calls out)
  * unrelated files             (negatives)

Everything is a pure function of (seed, n_files): the golden-fixture tests
and the bench corpus are reproducible bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_LANGS = ["py", "c", "go", "js", "java"]

_KEYWORDS = {
    "py": ["def", "return", "class", "import", "for", "in", "if", "else", "None"],
    "c": ["int", "return", "void", "struct", "for", "if", "else", "static", "char"],
    "go": ["func", "return", "type", "package", "for", "if", "else", "var", "nil"],
    "js": ["function", "return", "const", "let", "for", "if", "else", "var", "null"],
    "java": ["public", "return", "class", "void", "for", "if", "else", "static", "int"],
}

_IDENT_PARTS = [
    "acc", "buf", "cfg", "ctx", "data", "elem", "flag", "grid", "hash", "item",
    "key", "list", "map", "node", "opts", "pool", "queue", "row", "sum", "tmp",
    "user", "val", "vec", "word", "xs", "ys",
]


def _ident(rng: np.random.Generator) -> str:
    n = rng.integers(1, 3)
    return "_".join(_IDENT_PARTS[i] for i in rng.integers(0, len(_IDENT_PARTS), n))


def _make_file(rng: np.random.Generator, lang: str, n_lines: int) -> str:
    kw = _KEYWORDS[lang]
    lines = []
    for _ in range(n_lines):
        k = kw[rng.integers(0, len(kw))]
        a, b_, c = _ident(rng), _ident(rng), _ident(rng)
        form = rng.integers(0, 4)
        if form == 0:
            lines.append(f"{k} {a}({b_}, {c}):" if lang == "py" else f"{k} {a}({b_}, {c}) {{")
        elif form == 1:
            lines.append(f"    {a} = {b_} + {c} * {rng.integers(0, 100)}")
        elif form == 2:
            lines.append(f"    if {a} > {b_}: {c} = {rng.integers(0, 10)}" if lang == "py" else f"    if ({a} > {b_}) {c} = {rng.integers(0, 10)};")
        else:
            lines.append(f"    return {a}" if lang == "py" else f"    return {a};")
    return "\n".join(lines) + "\n"


def _mutate_whitespace(rng: np.random.Generator, text: str) -> str:
    """Whitespace/comment edits: canonical form is (nearly) unchanged."""
    lines = text.split("\n")
    out = []
    for ln in lines:
        r = rng.integers(0, 4)
        if r == 0:
            ln = ln + "   "
        elif r == 1 and ln.strip():
            ln = "  " + ln
        elif r == 2:
            ln = ln.replace(" = ", "  =  ")
        out.append(ln)
    if rng.integers(0, 2) == 0:
        out.insert(int(rng.integers(0, len(out))), "# edited")
    return "\n".join(out)


def _mutate_rename(rng: np.random.Generator, text: str) -> str:
    """Rename a few identifiers: high-but-not-perfect Jaccard."""
    victims = rng.choice(len(_IDENT_PARTS), size=2, replace=False)
    for v in victims:
        text = text.replace(_IDENT_PARTS[v], _IDENT_PARTS[(v + 7) % len(_IDENT_PARTS)] + "x")
    return text


def synth_code_corpus(
    n_files: int = 1000,
    seed: int = 42,
    dup_fraction: float = 0.35,
    n_repos: int | None = None,
    avg_lines: int = 40,
    vendored_families: int = 2,
    vendored_copies: int = 20,
) -> pa.Table:
    """Build the corpus.  Layout: base originals first, then mutated/exact
    copies referencing them, then vendored families spread across repos.

    Returns a pyarrow Table with columns
    (repo, path, commit, lang, content, dup_group) — ``dup_group`` is the
    ground-truth family id (-1 for unrelated files) used ONLY by tests, and
    dropped by pipelines.
    """
    rng = np.random.default_rng(seed)
    n_repos = n_repos or max(4, n_files // 50)
    n_dups = int(n_files * dup_fraction)
    n_base = n_files - n_dups - vendored_families * vendored_copies
    if n_base <= 0:
        raise ValueError("n_files too small for requested dup families")

    repos, paths, commits, langs, contents, groups = [], [], [], [], [], []

    def add(repo, path, lang, content, group):
        repos.append(repo)
        paths.append(path)
        commits.append(f"c{rng.integers(0, 1 << 30):08x}")
        langs.append(lang)
        contents.append(content)
        groups.append(group)

    base_texts = []
    for i in range(n_base):
        lang = _LANGS[int(rng.integers(0, len(_LANGS)))]
        n_lines = max(5, int(rng.normal(avg_lines, avg_lines / 3)))
        text = _make_file(rng, lang, n_lines)
        base_texts.append((lang, text))
        add(f"repo{int(rng.integers(0, n_repos))}", f"src/f{i}.{lang}", lang, text, i)

    for j in range(n_dups):
        src = int(rng.integers(0, n_base))
        lang, text = base_texts[src]
        m = rng.integers(0, 3)
        if m == 0:
            mutated = text  # exact copy
        elif m == 1:
            mutated = _mutate_whitespace(rng, text)
        else:
            mutated = _mutate_rename(rng, text)
        add(
            f"repo{int(rng.integers(0, n_repos))}",
            f"src/dup{j}_of_f{src}.{lang}",
            lang,
            mutated,
            src,
        )

    for fam in range(vendored_families):
        lang = _LANGS[int(rng.integers(0, len(_LANGS)))]
        text = _make_file(rng, lang, avg_lines * 2)
        for cp in range(vendored_copies):
            add(
                f"repo{cp % n_repos}",
                f"vendor/lib{fam}/mod.{lang}",
                lang,
                text,
                n_base + fam,
            )

    return pa.table(
        {
            "repo": pa.array(repos, type=pa.string()),
            "path": pa.array(paths, type=pa.string()),
            "commit": pa.array(commits, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
            "content": pa.array(contents, type=pa.large_string()),
            "dup_group": pa.array(groups, type=pa.int64()),
        }
    )


def write_synth_corpus(path: str, n_files: int = 1000, seed: int = 42, **kw) -> str:
    """Write the corpus parquet (without the ground-truth column) to `path`."""
    import pyarrow.parquet as pq

    t = synth_code_corpus(n_files=n_files, seed=seed, **kw)
    pq.write_table(t.drop_columns(["dup_group"]), path)
    return path


# ---------------------------------------------------------------------------
# Parallel generator: every file is a PURE FUNCTION of (seed, index), so the
# corpus is bit-identical regardless of how generation is parallelized —
# the property that makes Ray-parallel generation of multi-100MB bench
# corpora both fast and reproducible.
# ---------------------------------------------------------------------------


def synth_file(seed: int, idx: int, n_files: int, avg_lines: int = 40) -> dict:
    """Deterministic row for file `idx` of an n_files corpus.

    Layout: 60% originals, 30% mutated/exact copies of an original,
    10% vendored copies (40 families spread across repos — the hot-bucket
    skew case)."""
    n_base = int(n_files * 0.6)
    n_dup = int(n_files * 0.3)
    n_repos = max(8, n_files // 100)

    if idx < n_base:
        rng = np.random.default_rng([seed, 0, idx])
        lang = _LANGS[int(rng.integers(0, len(_LANGS)))]
        n_lines = max(5, int(rng.normal(avg_lines, avg_lines / 3)))
        text = _make_file(rng, lang, n_lines)
        return {
            "repo": f"repo{int(rng.integers(0, n_repos))}",
            "path": f"src/f{idx}.{lang}",
            "commit": f"c{int(rng.integers(0, 1 << 30)):08x}",
            "lang": lang,
            "content": text,
        }
    if idx < n_base + n_dup:
        j = idx - n_base
        rng = np.random.default_rng([seed, 1, j])
        src = int(rng.integers(0, n_base))
        base = synth_file(seed, src, n_files, avg_lines)
        m = int(rng.integers(0, 3))
        text = base["content"]
        if m == 1:
            text = _mutate_whitespace(rng, text)
        elif m == 2:
            text = _mutate_rename(rng, text)
        return {
            "repo": f"repo{int(rng.integers(0, n_repos))}",
            "path": f"src/dup{j}_of_f{src}.{base['lang']}",
            "commit": f"c{int(rng.integers(0, 1 << 30)):08x}",
            "lang": base["lang"],
            "content": text,
        }
    j = idx - n_base - n_dup
    fam = j % 40
    rng = np.random.default_rng([seed, 2, fam])
    lang = _LANGS[int(rng.integers(0, len(_LANGS)))]
    text = _make_file(rng, lang, avg_lines * 2)
    # commit derives from the copy index j (not just the family) so every
    # vendored row has a distinct (repo, path, commit) identity -> unique
    # doc_id even when lcm(40, n_repos) < n_vendored
    return {
        "repo": f"repo{j % n_repos}",
        "path": f"vendor/lib{fam}/mod.{lang}",
        "commit": f"c{fam:04x}{j:08x}",
        "lang": lang,
        "content": text,
    }


def write_synth_corpus_parallel(
    path: str, n_files: int, seed: int = 42, avg_lines: int = 40
) -> str:
    """Generate the corpus with Ray (one task per index chunk) and write one
    parquet file.  Requires an initialized Ray session."""
    import ray
    import ray.data

    def gen(batch: pa.Table) -> pa.Table:
        rows = [
            synth_file(seed, int(i), n_files, avg_lines)
            for i in batch["id"].to_pylist()
        ]
        return pa.table(
            {
                "repo": pa.array([r["repo"] for r in rows]),
                "path": pa.array([r["path"] for r in rows]),
                "commit": pa.array([r["commit"] for r in rows]),
                "lang": pa.array([r["lang"] for r in rows]),
                "content": pa.array(
                    [r["content"] for r in rows], type=pa.large_string()
                ),
            }
        )

    cpus = int(ray.cluster_resources().get("CPU", 4))
    ds = ray.data.range(n_files, override_num_blocks=cpus * 4).map_batches(
        gen, batch_format="pyarrow"
    )
    # a DIRECTORY of parquet files: parallel write now, parallel read later
    # (a single big file serializes the first read's decompress)
    ds.write_parquet(path)
    return path
