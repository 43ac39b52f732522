"""Multimodal resize + audio-framing plumbing (LLM-pipeline extension,
extending the decode / feature-extract / frame-sample set from
mm01/mm02 in llm_queries.py with RESIZE (mm03) and AUDIO WINDOWING
(mm04)).

``mm03_thumbnail`` subsamples a 2-D grid out of each document — the
payload arranged row-major at a fixed width, every 2nd row and 2nd column
kept, exactly a nearest-neighbor 2x image downsample. As with mm01/mm02
the pixel decode is a DETERMINISTIC FAKE (the "pixels" are the document's
tokens; real codecs are not in this container) while the Spark-side
contract is real: Arrow-batched mapInPandas, per-batch Python loop over
variable-size payloads, compact per-doc summary out. Swap the token
matrix for ``np.frombuffer(payload)`` rows on a real cluster and the
plumbing is unchanged.

Registered after ``quantize`` in ``queries.__init__._MODULES`` — new
round-4 entries must not queue-jump the never-driver-verified queries at
the registry front (VERDICT r3 #1).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

from . import load_tables, register
from .llm_queries import _DUCK_TOKENS

#: fake image geometry: tokens laid out row-major IN_W wide; resize keeps
#: every STRIDE-th row and column (nearest-neighbor 2x downsample)
IN_W, STRIDE = 16, 2


def _py_tokens(s):
    """The fake-decode tokenizer, shared by every mm kernel in this module.

    ``re.ASCII`` pins ``\\s`` to the ASCII class — Java's ``\\s`` (the Spark
    ``_tokens`` split) and RE2's (the DuckDB oracles) are ASCII-only, and
    Python is the odd engine out on Unicode whitespace like U+00A0
    (code-review r4). No edge trim at all (ADVICE r4): ``str.strip()``
    stripped Unicode whitespace that neither Spark's ``trim`` nor DuckDB's
    removes, shifting token boundaries — and an ASCII trim is redundant,
    because ASCII-whitespace edges just split into empty tokens that the
    filter drops, while non-ASCII whitespace must stay attached for
    cross-engine parity. Defined at module level (one copy,
    cloudpickle-safe for mapInPandas) instead of per-kernel closures.
    """
    import re

    if s is None:
        return []
    return [t for t in re.split(r"\s+", s.lower(), flags=re.ASCII) if t]


@register(
    "mm03_thumbnail",
    oracle=f"""
    WITH t AS (
        -- coalesce: _py_tokens maps a NULL payload to the empty token
        -- list (a real decode kernel sees an empty payload); the oracle
        -- pins the same convention, since _DUCK_TOKENS would otherwise
        -- propagate NULL through every output (NULL-parity net r13)
        SELECT doc_id, {_DUCK_TOKENS} AS ws
        FROM (SELECT doc_id, coalesce(text, '') AS text FROM documents)
    ), m AS (
        SELECT doc_id, ws, len(ws) AS n,
               CAST(ceil(len(ws) / {IN_W}.0) AS INT) AS in_h
        FROM t
    ), k AS (
        SELECT doc_id, n, in_h,
               list_transform(
                   list_filter(range(0, n),
                               i -> (i // {IN_W}) % {STRIDE} = 0
                                AND (i % {IN_W}) % {STRIDE} = 0),
                   i -> ws[i + 1]) AS kept
        FROM m
    )
    SELECT doc_id,
           CAST(n AS INT) AS n_tokens,
           in_h,
           CAST(ceil(in_h / {STRIDE}.0) AS INT) AS out_h,
           CAST(len(kept) AS INT) AS n_kept,
           -- coalesce: DuckDB's array_to_string([]) is NULL, not '' — the
           -- kernel hashes the empty string for an empty thumbnail
           md5(coalesce(array_to_string(kept, ' '), '')) AS thumb_md5
    FROM k
    """,
)
def mm03_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM3 (extension): nearest-neighbor 2x "thumbnail" — keep every 2nd
    row and 2nd column of the payload grid (row-major, width 16) and
    fingerprint the result. One Arrow batch in, one summary row per doc
    out; the Python loop is per payload, the natural unit a real resize
    kernel has."""
    d = load_tables(spark, sf_dir, "documents")["documents"]

    def _resize(batches: Iterator) -> Iterator:
        import hashlib
        import math

        import numpy as np
        import pandas as pd

        toks = _py_tokens

        for pdf in batches:
            out = {"doc_id": [], "n_tokens": [], "in_h": [], "out_h": [], "n_kept": [], "thumb_md5": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                ws = toks(text)
                n = len(ws)
                in_h = math.ceil(n / IN_W)
                # vectorized keep-mask over the row-major grid (numpy does
                # the index arithmetic for the whole payload at once; a real
                # pixel kernel would be ndarray[::STRIDE, ::STRIDE])
                idx = np.arange(n)
                mask = ((idx // IN_W) % STRIDE == 0) & ((idx % IN_W) % STRIDE == 0)
                kept = np.asarray(ws, dtype=object)[mask]
                out["doc_id"].append(doc_id)
                out["n_tokens"].append(n)
                out["in_h"].append(in_h)
                out["out_h"].append(math.ceil(in_h / STRIDE))
                out["n_kept"].append(int(mask.sum()))
                out["thumb_md5"].append(hashlib.md5(" ".join(kept.tolist()).encode()).hexdigest())
            yield pd.DataFrame(out)

    return d.select("doc_id", "text").mapInPandas(
        _resize,
        "doc_id long, n_tokens int, in_h int, out_h int, n_kept int, thumb_md5 string",
    )


#: fake audio framing geometry: overlapping analysis windows of FRAME
#: samples, hop HOP — the standard STFT-style layout (frame k covers
#: samples [k*HOP, k*HOP+FRAME), truncated at the signal end)
FRAME, HOP = 8, 4


@register(
    "mm04_audio_frames",
    oracle=f"""
    WITH t AS (
        -- coalesce: NULL payload = empty payload, as in mm03
        SELECT doc_id, {_DUCK_TOKENS} AS ws
        FROM (SELECT doc_id, coalesce(text, '') AS text FROM documents)
    ), m AS (
        SELECT doc_id,
               list_transform(ws, w -> CAST(length(w) AS BIGINT)) AS samples,
               len(ws) AS n
        FROM t
    ), f AS (
        SELECT doc_id, n,
               list_transform(
                   range(0, CAST(ceil(n / {HOP}.0) AS INT)),
                   k -> coalesce(list_aggregate(
                            list_transform(
                                list_slice(samples, k * {HOP} + 1,
                                           least(k * {HOP} + {FRAME}, n)),
                                x -> x * x),
                            'sum'), 0)) AS energies
        FROM m
    )
    SELECT doc_id,
           CAST(n AS INT) AS n_samples,
           CAST(len(energies) AS INT) AS n_frames,
           CAST(coalesce(list_aggregate(energies, 'sum'), 0) AS BIGINT)
               AS total_energy,
           CAST(coalesce(list_aggregate(energies, 'max'), 0) AS BIGINT)
               AS peak_energy,
           -- coalesce: array_to_string([]) is NULL in DuckDB (see mm03)
           md5(coalesce(array_to_string(energies, ','), '')) AS frames_md5
    FROM f
    """,
)
def mm04_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM4 (extension): STFT-style audio framing — overlapping windows of
    8 "samples" at hop 4, per-frame energy (sum of squares), per-doc
    energy totals + a fingerprint of the frame-energy sequence.  As with
    mm01-mm03 the decode is a DETERMINISTIC FAKE (samples are token
    lengths; audio codecs aren't in this container) while the Spark-side
    contract is real: Arrow-batched ``mapInPandas``, a per-payload Python
    loop (the natural unit of a real windowing kernel), integer energies
    so every output is order- and float-independent.  Swap the token
    lengths for ``np.frombuffer(payload, dtype='<i2')`` on a real cluster
    and the plumbing is unchanged."""
    d = load_tables(spark, sf_dir, "documents")["documents"]

    def _frames(batches: Iterator) -> Iterator:
        import hashlib
        import math

        import numpy as np
        import pandas as pd

        toks = _py_tokens

        for pdf in batches:
            out = {
                "doc_id": [], "n_samples": [], "n_frames": [],
                "total_energy": [], "peak_energy": [], "frames_md5": [],
            }
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                samples = np.fromiter(
                    (len(t) for t in toks(text)), dtype=np.int64
                )
                n = int(samples.size)
                n_frames = math.ceil(n / HOP)
                # vectorized sliding-window energies via a prefix sum of the
                # squared signal: frame k = csum[end_k] - csum[start_k],
                # O(n) total instead of O(n * FRAME/HOP) python-loop adds
                csum = np.concatenate(([0], np.cumsum(samples * samples)))
                starts = np.arange(n_frames) * HOP
                ends = np.minimum(starts + FRAME, n)
                energies = csum[ends] - csum[starts]
                out["doc_id"].append(doc_id)
                out["n_samples"].append(n)
                out["n_frames"].append(n_frames)
                out["total_energy"].append(int(energies.sum()))
                out["peak_energy"].append(int(energies.max()) if n_frames else 0)
                out["frames_md5"].append(
                    hashlib.md5(
                        ",".join(map(str, energies.tolist())).encode()
                    ).hexdigest()
                )
            yield pd.DataFrame(out)

    return d.select("doc_id", "text").mapInPandas(
        _frames,
        "doc_id long, n_samples int, n_frames int, "
        "total_energy long, peak_energy long, frames_md5 string",
    )
