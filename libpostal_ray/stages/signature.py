"""SignatureStage — MinHash + SimHash sketches per row.

The analog of the reference's "heavy model in a process-global singleton"
pattern (address parser singleton, address_parser.c:1843-1855): configuration
is built once per worker and reused across batches.  Content is DROPPED after
this stage — downstream shuffles carry only (doc_id, sha256, sketches), the
dataset-scale version of libpostal's zero-copy token spans
(libpostal.h:280-284): never ship the big payload when a fixed-width
reference suffices.

Scale path: shingle hashes are computed in ONE vectorized pass over the
batch's concatenated canonical value buffer (zero-copy Arrow view); shingles
that cross row boundaries are masked out with index arithmetic.  No per-row
Python string or bytes object is created anywhere in this stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from libpostal_ray.config import PipelineConfig
from libpostal_ray.functions.canonicalize import large_string_view
from libpostal_ray.functions.lsh import band_keys
from libpostal_ray.functions.simhash import simhash_chunk_keys

SIGNATURE_COLUMNS = [
    "doc_id",
    "sha256",
    "sha_key",
    "n_chars",
    "n_shingles",
    "is_short",
    "minhash8",
    "simhash",
    "phonetic",
    "phonetic2",
    "acronym",
    "acronym2",
    "exp4",
    "band_keys",
]


def _segment_gather(
    concat: np.ndarray, seg_starts: np.ndarray, seg_counts: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Gather variable-length segments [start, start+count) from `concat`
    into one contiguous array + offsets — fully vectorized."""
    total = int(seg_counts.sum())
    offs = np.zeros(seg_counts.shape[0] + 1, dtype=np.int64)
    np.cumsum(seg_counts, out=offs[1:])
    if total == 0:
        return np.empty(0, dtype=concat.dtype), offs
    intra = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], seg_counts)
    pos = np.repeat(seg_starts, seg_counts) + intra
    return concat[pos], offs


class SignatureStage:
    """batch (doc_id, sha256, canonical, n_chars) ->
    (doc_id, sha256, n_chars, n_shingles, is_short, minhash, simhash,
     band_keys).

    Length routing with a BOUNDARY BAND (the geohash+neighbors trick,
    near_dupe.c:220-248, applied to the cutoff):
    - canonical length >= cutoff - boundary_band: MinHash LSH band keys.
    - canonical length <  cutoff + boundary_band: SimHash chunk keys
      (pigeonhole guarantee for hamming <= simhash_max_hamming).
    Rows inside the band emit BOTH families, so a near-dup pair straddling
    the cutoff still becomes a candidate.  ``is_short`` (length < cutoff)
    routes pair VERIFICATION (stages/verify.py).
    Both families live in one ``band_keys`` list column with disjoint salts,
    so ONE downstream groupby serves both.
    """

    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()
        self._alt_compiled = None
        if self.cfg.expansion_keys:
            from libpostal_ray.functions.expand import compile_alternatives

            # compiled once per worker (the dictionary-trie setup analog,
            # libpostal.c:289-330)
            self._alt_compiled = compile_alternatives(
                self.cfg.expansion_alternatives
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return self._process(batch)
        from libpostal_ray.stages.canonicalize import (
            byte_chunk_bounds,
            content_cum_bytes,
        )

        cum = content_cum_bytes(batch["canonical"])
        bounds = byte_chunk_bounds(cum, self.cfg.kernel_chunk_bytes)
        if len(bounds) == 1:
            return self._process(batch)
        parts = [self._process(batch.slice(s, e - s)) for s, e in bounds]
        return pa.concat_tables(parts)

    def _process(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        k = cfg.shingle_k

        from libpostal_ray.functions.hashing import rolling_shingle_hashes
        from libpostal_ray.functions.minhash import oph_minhash_batch
        from libpostal_ray.functions.simhash import simhash_batch, simhash_of_hashes

        col = batch["canonical"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        data, off = large_string_view(col)
        lens = np.diff(off)

        # canonical char length (codepoints) for the cutoff decisions
        hi = data >= 0x80
        if hi.any():
            cont = (data & 0xC0) == 0x80
            ccum = np.zeros(data.shape[0] + 1, dtype=np.int64)
            np.cumsum(cont, out=ccum[1:])
            char_len = lens - (ccum[off[1:]] - ccum[off[:-1]])
        else:
            char_len = lens

        # ONE rolling-hash pass over the whole buffer; per-row shingles are
        # the positions that don't cross a row boundary
        h_all = rolling_shingle_hashes(data, k)
        counts = np.maximum(0, lens - (k - 1))
        concat, voff = _segment_gather(h_all, off[:-1], counts)
        sigs = oph_minhash_batch(concat, voff, cfg.num_perm)

        # DISTINCT shingle count per row (not the position count): the
        # size-ratio guard in verify_pair_statuses relies on the bound
        # J(A,B) <= min(|A|,|B|)/max(|A|,|B|), which only holds for
        # distinct-shingle SET sizes — a file that is N repeats of another's
        # content has a near-identical shingle set but an N:1 position
        # ratio, and the multiset count would silently drop the pair.
        # Per-segment np.sort loop: rows per cache-blocked sub-batch are few
        # (~100), so many small sorts beat one global lexsort 14x (measured;
        # the lexsort's argsort indirection + gathers dominate).
        distinct = np.zeros(n, dtype=np.int64)
        if concat.shape[0]:
            for i in range(n):
                seg = concat[voff[i] : voff[i + 1]]
                if seg.shape[0]:
                    s = np.sort(seg)
                    distinct[i] = 1 + int((s[1:] != s[:-1]).sum())

        cutoff = cfg.short_file_cutoff
        band = cfg.boundary_band
        is_short = char_len < cutoff
        emit_mh = (char_len >= cutoff - band) & (counts > 0)
        emit_sh = char_len < cutoff + band

        # SimHash only for rows that emit chunk keys (gated, vectorized)
        sims = np.zeros(n, dtype=np.uint64)
        rows_sh = np.flatnonzero(emit_sh)
        if rows_sh.size:
            have = rows_sh[counts[rows_sh] > 0]
            if have.size:
                sub, soff = _segment_gather(concat, voff[have], counts[have])
                sims[have] = simhash_batch(sub, soff)
            # rows shorter than k: hash the whole content as one shingle
            tiny = rows_sh[(counts[rows_sh] == 0) & (lens[rows_sh] > 0)]
            for r in tiny:
                seg = data[off[r] : off[r + 1]]
                sims[r] = simhash_of_hashes(
                    rolling_shingle_hashes(seg, int(seg.shape[0]))
                )

        # phonetic codes for short rows (config-gated; Python loop over the
        # FEW short rows only — long content is covered by MinHash).  ph2 is
        # the Double Metaphone ALTERNATE pronunciation (0 = none): it emits
        # its own band key and verify matches any primary/alternate combo
        ph = np.zeros(n, dtype=np.int64)
        ph2 = np.zeros(n, dtype=np.int64)
        if cfg.phonetic_keys and rows_sh.size:
            from libpostal_ray.functions.phonetic import phonetic_code_arrays

            ph[rows_sh], ph2[rows_sh] = phonetic_code_arrays(
                col.take(pa.array(rows_sh)).to_pylist(), cfg.phonetic_algo
            )

        # acronym keys (config-gated; near_dupe.c:416-559 family): SIGNED
        # row keys — negative marks the single-token self form; band keys
        # emit the absolute value (see functions/acronym.py).  Eligibility
        # uses its OWN length gate (acronym_max_chars): a spelled-out
        # multi-token name is usually longer than the short-row cutoff.
        acr = np.zeros(n, dtype=np.int64)
        acr2 = np.zeros(n, dtype=np.int64)
        if cfg.acronym_keys:
            rows_ac_elig = np.flatnonzero(char_len <= cfg.acronym_max_chars)
            if rows_ac_elig.size:
                from libpostal_ray.functions.acronym import acronym_key_arrays

                acr[rows_ac_elig], acr2[rows_ac_elig] = acronym_key_arrays(
                    col.take(pa.array(rows_ac_elig)).to_pylist(),
                    cfg.acronym_max_tokens,
                )

        # multi-form expansion keys for short rows (config-gated;
        # expand_address parity, expand.c:1453-1553): one band key per
        # alternative form of the canonical text, identity form included —
        # two rows sharing ANY form land in one bucket
        # (expansions_intersect blocking, dedupe.c:13-31).  exp4 stores the
        # first 4 form hashes for the verify-stage intersect upgrade.
        exp_counts = np.zeros(n, dtype=np.int64)
        exp_flat = np.empty(0, dtype=np.int64)
        exp4 = np.zeros((n, 4), dtype=np.int64)
        if cfg.expansion_keys and rows_sh.size:
            from libpostal_ray.functions.expand import (
                expand_variants,
                expansion_key_hashes,
            )

            texts_sh = col.take(pa.array(rows_sh)).to_pylist()
            flat_parts: list[np.ndarray] = []
            for j, r in enumerate(rows_sh):
                txt = texts_sh[j]
                if not txt:
                    continue
                forms = expand_variants(
                    txt, self._alt_compiled, cfg.max_expansions
                )
                keys_r = expansion_key_hashes(forms)
                exp_counts[r] = keys_r.shape[0]
                exp4[r, : min(4, keys_r.shape[0])] = keys_r[:4]
                flat_parts.append(keys_r)
            if flat_parts:
                exp_flat = np.concatenate(flat_parts)

        rows_mh = np.flatnonzero(emit_mh)
        bk_sub = (
            band_keys(sigs[rows_mh], cfg.bands, cfg.rows_per_band)
            if rows_mh.size
            else np.empty((0, cfg.bands), dtype=np.int64)
        )
        sk_sub = (
            simhash_chunk_keys(sims[rows_sh], cfg.simhash_chunks)
            if rows_sh.size
            else np.empty((0, cfg.simhash_chunks), dtype=np.int64)
        )

        # assemble the band_keys list column without per-row Python lists
        has_ph = ph != 0
        has_ph2 = ph2 != 0
        has_ac = acr != 0
        has_ac2 = acr2 != 0
        nkeys = (
            emit_mh.astype(np.int64) * cfg.bands
            + emit_sh.astype(np.int64) * cfg.simhash_chunks
            + has_ph.astype(np.int64)
            + has_ph2.astype(np.int64)
            + has_ac.astype(np.int64)
            + has_ac2.astype(np.int64)
            + exp_counts
        )
        koff = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(nkeys, out=koff[1:])
        vals = np.empty(int(koff[-1]), dtype=np.int64)
        if rows_mh.size:
            idx = (koff[rows_mh][:, None] + np.arange(cfg.bands)).ravel()
            vals[idx] = bk_sub.ravel()
        if rows_sh.size:
            base = koff[rows_sh] + emit_mh[rows_sh] * cfg.bands
            idx = (base[:, None] + np.arange(cfg.simhash_chunks)).ravel()
            vals[idx] = sk_sub.ravel()
        rows_ph = np.flatnonzero(has_ph)
        if rows_ph.size:
            # the phonetic band key slots come after both other families;
            # row codes are already salt-mixed into their own key space
            # (functions/phonetic.py), disjoint from MinHash/SimHash keys whp
            base = (
                koff[rows_ph]
                + emit_mh[rows_ph] * cfg.bands
                + emit_sh[rows_ph] * cfg.simhash_chunks
            )
            vals[base] = ph[rows_ph]
        rows_ph2 = np.flatnonzero(has_ph2)
        if rows_ph2.size:
            # alternate-pronunciation slot (double metaphone secondary)
            base2 = (
                koff[rows_ph2]
                + emit_mh[rows_ph2] * cfg.bands
                + emit_sh[rows_ph2] * cfg.simhash_chunks
                + has_ph[rows_ph2]
            )
            vals[base2] = ph2[rows_ph2]
        rows_ac = np.flatnonzero(has_ac)
        if rows_ac.size:
            # acronym key slot: ABSOLUTE value (band keys must be >= 0;
            # the sign only travels in the acronym column for verify)
            base_ac = (
                koff[rows_ac]
                + emit_mh[rows_ac] * cfg.bands
                + emit_sh[rows_ac] * cfg.simhash_chunks
                + has_ph[rows_ac]
                + has_ph2[rows_ac]
            )
            vals[base_ac] = np.abs(acr[rows_ac])
        rows_ac2 = np.flatnonzero(has_ac2)
        if rows_ac2.size:
            base_ac2 = (
                koff[rows_ac2]
                + emit_mh[rows_ac2] * cfg.bands
                + emit_sh[rows_ac2] * cfg.simhash_chunks
                + has_ph[rows_ac2]
                + has_ph2[rows_ac2]
                + has_ac[rows_ac2]
            )
            vals[base_ac2] = np.abs(acr2[rows_ac2])
        rows_ex = np.flatnonzero(exp_counts > 0)
        if rows_ex.size:
            # expansion-form key slots fill the tail of each row's range
            # (variable count; flat positions via repeat + intra-run arange)
            cnts = exp_counts[rows_ex]
            base_ex = (
                koff[rows_ex]
                + emit_mh[rows_ex] * cfg.bands
                + emit_sh[rows_ex] * cfg.simhash_chunks
                + has_ph[rows_ex]
                + has_ph2[rows_ex]
                + has_ac[rows_ex]
                + has_ac2[rows_ex]
            )
            eoff = np.zeros(rows_ex.shape[0] + 1, dtype=np.int64)
            np.cumsum(cnts, out=eoff[1:])
            intra = np.arange(int(eoff[-1]), dtype=np.int64) - np.repeat(
                eoff[:-1], cnts
            )
            vals[np.repeat(base_ex, cnts) + intra] = exp_flat
        band_keys_arr = pa.ListArray.from_arrays(
            pa.array(koff.astype(np.int32)), pa.array(vals, type=pa.int64())
        )

        # 63-bit prefix of sha256 as an int64 grouping key: lets bucket
        # workers collapse content-identical members to one representative
        # (star pairing) without shipping the full 32-byte digest through
        # the LSH exchange.  A prefix collision between DIFFERENT contents
        # only costs a wasted candidate pair (verify compares full sha).
        sha_col = batch["sha256"]
        if isinstance(sha_col, pa.ChunkedArray):
            sha_col = sha_col.combine_chunks()
        sha_buf = sha_col.buffers()[1]
        sha_words = np.frombuffer(
            sha_buf, dtype=">u8", count=4 * n, offset=sha_col.offset * 32
        )[::4]
        sha_key = (sha_words & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)

        out_cols = {
            "doc_id": batch["doc_id"],
            "sha256": batch["sha256"],
            "sha_key": pa.array(sha_key, type=pa.int64()),
            "n_chars": batch["n_chars"],
            "n_shingles": pa.array(distinct, type=pa.int64()),
            "is_short": pa.array(is_short),
            # ONLY the b-bit signature leaves this stage: the full 64-bit
            # signature exists transiently for band-key derivation and is
            # dropped — at 1 KB/row it would dominate every downstream
            # materialization.  b-bit MinHash (Li & Koenig, WWW'10): the low
            # 8 bits of each slot are all verification needs; the estimator
            # corrects for the 1/256 accidental-collision rate
            # (stages/verify.py).  SimHash is bit-cast to int64: uint64
            # values over 2^63 degrade to pickled-object columns in Ray
            # shuffles; XOR/popcount are identical on the signed view.
            "minhash8": pa.FixedSizeListArray.from_arrays(
                pa.array(
                    (sigs.reshape(-1) & np.uint64(0xFF)).astype(np.uint8),
                    type=pa.uint8(),
                ),
                cfg.num_perm,
            ),
            "simhash": pa.array(sims.view(np.int64), type=pa.int64()),
            "phonetic": pa.array(ph, type=pa.int64()),
            "phonetic2": pa.array(ph2, type=pa.int64()),
            "acronym": pa.array(acr, type=pa.int64()),
            "acronym2": pa.array(acr2, type=pa.int64()),
            # first 4 expansion-form hashes (0-padded): the verify stage's
            # expansions_intersect evidence.  Fixed width keeps the
            # broadcast state flat and the join payload packable.
            "exp4": pa.FixedSizeListArray.from_arrays(
                pa.array(exp4.reshape(-1), type=pa.int64()), 4
            ),
            "band_keys": band_keys_arr,
        }
        # checkpoint partition id (and any other passthrough key) survives
        if "pid" in batch.column_names:
            out_cols["pid"] = batch["pid"]
        return pa.table(out_cols)
