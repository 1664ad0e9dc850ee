"""Audio fingerprinting + near-duplicate audio detection.

The audio leg of the multimodal dedup family (image_dedup is the
image leg): a Haitsma–Kalker-style spectral-gradient fingerprint —
64 bits, bit j = (band_energy[j] > band_energy[j+1]) over 65
contiguous magnitude-spectrum bands — and near-duplicates are pairs
within a small Hamming distance. Re-encoded/re-sampled copies of the
same recording keep their spectral envelope, so the gradient bits
survive where byte-exact dedup fails.

Same Spark shape and guarantees as image_dedup:
- fingerprinting is a NARROW map. stub=True derives the 65 band
  energies from a mixed-moduli md5-digest tile (period
  lcm(13,16)=208 — see _stub_bands_struct for why neither 13 nor 16
  alone survives) as pure JVM expressions — SQL-oracle-replayable
  bit-for-bit;
  stub=False decodes real PCM WAV in mapInPandas (stdlib `wave` +
  numpy rfft — the same honest-decode subset as audio_features) and
  runs the SAME comparison on real energies.
- the 64 bits pack into four 16-bit band integers (h0..h3) and
  near-dup search reuses image_dedup.banded_hamming_pairs: pigeonhole
  recall is EXACT for max_hamming <= 3, candidates verified with the
  exact Hamming distance, no all-pairs anywhere.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dask_ml_spark.datapipe.image_dedup import (N_BANDS, band_fold_sql,
                                                banded_hamming_pairs,
                                                md5_byte_sql)
from dask_ml_spark.utils import ensure_min_partitions

_N_ENERGIES = 65  # 64 gradient bits


def _stub_bands_struct(blob_col_sql: str):
    """struct(h0..h3) from the md5-tile fake energies:
    energy[k] = byte[k mod 13] XOR byte[(5k+1) mod 16] — the audio
    stub needs no 2-D indexing, so the expression is a direct
    adjacent-energy compare. Same HOF shape as image_dedup (per-bit
    unrolls blow the codegen method limit).

    Why two mixed moduli (ADVICE r6): a single-byte tile repeats —
    mod 16 makes band b's bits compare byte[(16b+j) mod 16] =
    byte[j mod 16], so b cancels and all four bands come out
    IDENTICAL (caught in review: effective space 2^16); a bare
    mod 13 makes bit p identical to bit p+13, collapsing the
    keyspace to ~2^13 and colliding unrelated blobs at Hamming 0
    with prob ~1/8192 — visibly inflating near-dup counts at bench
    SFs. XORing the coprime-stride 16-byte lookup gives the tile
    period lcm(13,16) = 208 > 65, so all 64 comparison bits are
    distinct digest functions and the stub keyspace is a real
    ~2^64."""
    energies = (f"transform(sequence(0, {_N_ENERGIES - 1}), i -> "
                f"({md5_byte_sql('hx', 'i', 13)} ^ "
                f"{md5_byte_sql('hx', '5*i+1', 16)}))")
    bands = ", ".join(
        band_fold_sql(b, f"16*{b}+j+1", f"16*{b}+j+2")
        for b in range(N_BANDS))
    inner = f"element_at(transform(array({energies}), g -> struct({bands})), 1)"
    return F.expr(
        f"element_at(transform(array(md5({blob_col_sql})), hx -> {inner}), 1)")


def _real_bands(raw: bytes) -> list[int]:
    """Fingerprint of a real PCM WAV blob: decode, magnitude spectrum,
    65 contiguous band energies, adjacent-band compare."""
    from dask_ml_spark.datapipe.multimodal import _decode_wav

    samples, _rate = _decode_wav(raw)
    if len(samples) < 2:
        energies = np.zeros(_N_ENERGIES)
    else:
        mag = np.abs(np.fft.rfft(samples))
        # split the spectrum into 65 contiguous bands (uneven tail ok)
        bounds = np.linspace(0, len(mag), _N_ENERGIES + 1).astype(int)
        energies = np.asarray([
            mag[a:b].sum() if b > a else 0.0
            for a, b in zip(bounds[:-1], bounds[1:])])
    bits = (energies[:-1] > energies[1:]).astype("int64")
    return [int((bits[16 * b:16 * b + 16] << np.arange(15, -1, -1)).sum())
            for b in range(N_BANDS)]


def audio_fingerprints(df: DataFrame, blob_col: str = "blob",
                       id_col: str = "doc_id",
                       stub: bool = True) -> DataFrame:
    """(id, h0..h3) — the spectral-gradient fingerprint of every audio
    blob, as four 16-bit band integers."""
    if stub:
        s = _stub_bands_struct(blob_col)
        # long bands, matching the mapInPandas real path (stub/real
        # schema parity — see image_dedup.image_hashes)
        return ensure_min_partitions(df).select(
            F.col(id_col), s.alias("__s")).select(
            id_col, *[F.col(f"__s.h{i}").cast("long").alias(f"h{i}")
                      for i in range(4)])

    import pandas as pd
    from pyspark.sql import types as T

    def _fp(it):
        for pdf in it:
            rows = [_real_bands(bytes(d) if d is not None else b"")
                    for d in pdf[blob_col]]
            arr = np.asarray(rows, dtype="int64").reshape(-1, N_BANDS)
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "h0": arr[:, 0], "h1": arr[:, 1],
                "h2": arr[:, 2], "h3": arr[:, 3]})

    schema = T.StructType([df.schema[id_col]] + [
        T.StructField(f"h{i}", T.LongType()) for i in range(N_BANDS)])
    return ensure_min_partitions(
        df.select(id_col, blob_col)).mapInPandas(_fp, schema=schema)


def audio_near_dup(df: DataFrame, blob_col: str = "blob",
                   id_col: str = "doc_id", max_hamming: int = 3,
                   stub: bool = True,
                   collapse_exact: bool = False) -> DataFrame:
    """Near-duplicate audio PAIRS (id_a, id_b, hamming), id_a < id_b,
    hamming <= max_hamming — exhaustive recall for max_hamming <= 3
    (see image_dedup.banded_hamming_pairs)."""
    fps = audio_fingerprints(df, blob_col, id_col, stub=stub)
    return banded_hamming_pairs(fps, id_col, max_hamming,
                                collapse_exact=collapse_exact)
