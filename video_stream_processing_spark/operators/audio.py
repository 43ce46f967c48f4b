"""Audio-column operators — WAV clips as opaque BINARY columns decoded
by Arrow-batched ``mapInPandas``, the audio leg of the multimodal
surface (images: operators/multimodal.py; video: mjpeg_frames_stats).

Same engine contract as every decode operator here (after the
reference's binary-payload design, VideoFrame.frameData byte[] +
ImageUtils.decodeImage null-on-failure, util/ImageUtils.java:23-36):

- bytes never cross a shuffle — decode happens in the scan's own tasks
  and only typed scalar features leave the UDF;
- undecodable payloads yield null features, never dropped rows, so
  corpus accounting stays exact;
- features are integer-exact (sums of squares, sign flips, extrema) so
  a DuckDB oracle can verify the REAL codec end to end when the synth
  clip is arithmetic (x54/x55), not merely the plumbing.

At 100 TB: a WAV row is self-contained, so this is embarrassingly
parallel — cost is one scan, no shuffle, no state; per-frame fan-out
(``wav_frame_energy``) expands in place inside the UDF exactly like
the MJPEG frame splitter, so the fan-out also ships no binary.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

CLIP_SCHEMA = (
    "doc_id long, n_frames int, sample_rate int, channels int, "
    "amp_min int, amp_max int, energy long, zero_cross int"
)


def wav_clip_features(df: DataFrame) -> DataFrame:
    """Decode WAV payloads -> per-clip integer-exact features.

    energy = sum over ALL channels of sample^2 (int64 — exact);
    zero_cross = count of sign flips on channel 0, where "negative" is
    the sign class (s < 0) so zero counts as non-negative — an
    unambiguous rule both engines replay exactly. Undecodable -> null
    features with n_frames/channels null too (the decode-or-null
    contract)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from video_stream_processing_spark.functions.wavcodec import decode_wav

        for pdf in batches:
            n_frames, rates, chans = [], [], []
            amins, amaxs, energies, zcs = [], [], [], []
            for blob in pdf["payload"]:
                decoded = decode_wav(blob)
                if decoded is None:
                    n_frames.append(None)
                    rates.append(None)
                    chans.append(None)
                    amins.append(None)
                    amaxs.append(None)
                    energies.append(None)
                    zcs.append(None)
                    continue
                samples, rate = decoded
                n, ch = samples.shape
                n_frames.append(n)
                rates.append(rate)
                chans.append(ch)
                amins.append(int(samples.min()))
                amaxs.append(int(samples.max()))
                energies.append(int((samples.astype(np.int64) ** 2).sum()))
                c0 = samples[:, 0] < 0
                zcs.append(int((c0[1:] != c0[:-1]).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": pd.array(n_frames, dtype="Int32"),
                    "sample_rate": pd.array(rates, dtype="Int32"),
                    "channels": pd.array(chans, dtype="Int32"),
                    "amp_min": pd.array(amins, dtype="Int32"),
                    "amp_max": pd.array(amaxs, dtype="Int32"),
                    "energy": pd.array(energies, dtype="Int64"),
                    "zero_cross": pd.array(zcs, dtype="Int32"),
                }
            )

    return df.mapInPandas(extract, schema=CLIP_SCHEMA)


FRAME_SCHEMA = (
    "doc_id long, frame_id int, n_in_frame int, energy long, silent boolean"
)


def wav_frame_energy(
    df: DataFrame, frame_len: int = 16, silence_threshold: int = 1_000_000
) -> DataFrame:
    """Fixed-length framing + per-frame energy (the VAD/silence-trim
    primitive): each clip fans out to ceil(n/frame_len) frames in place
    (last frame may be partial), energy sums sample^2 over all channels
    in the frame, ``silent`` = energy < threshold. One mapInPandas does
    decode AND fan-out, so the binary never leaves the scan task —
    the audio analog of mjpeg_frames_stats' split-and-decode."""

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from video_stream_processing_spark.functions.wavcodec import decode_wav

        for pdf in batches:
            doc_ids, frame_ids, counts, energies, silents = [], [], [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                decoded = decode_wav(blob)
                if decoded is None:
                    continue  # frame table indexes decodable clips only
                samples, _rate = decoded
                n = samples.shape[0]
                sq = (samples.astype(np.int64) ** 2).sum(axis=1)
                for f in range(0, (n + frame_len - 1) // frame_len):
                    seg = sq[f * frame_len : (f + 1) * frame_len]
                    e = int(seg.sum())
                    doc_ids.append(doc_id)
                    frame_ids.append(f)
                    counts.append(len(seg))
                    energies.append(e)
                    silents.append(e < silence_threshold)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(doc_ids, dtype="Int64"),
                    "frame_id": pd.array(frame_ids, dtype="Int32"),
                    "n_in_frame": pd.array(counts, dtype="Int32"),
                    "energy": pd.array(energies, dtype="Int64"),
                    "silent": pd.array(silents, dtype="boolean"),
                }
            )

    return df.mapInPandas(split, schema=FRAME_SCHEMA)


def resample_wav_2x(df: DataFrame) -> DataFrame:
    """Binary -> binary audio transform: decode, 2x linear upsample,
    re-encode at double the rate (the sample-rate normalization step a
    speech pipeline runs before feature extraction / model ingest).

    Output length 2n-1 per channel: even positions copy source frames,
    odd positions are floor((s_k + s_{k+1}) / 2) — integer linear
    interpolation, exactly replayable in SQL (floor, not truncate,
    so negative midpoints match numpy's // semantics). Undecodable
    payloads pass through as NULL payload (decode-or-null). Pure
    per-row compute: scan -> UDF, no shuffle, binary stays in place."""

    def resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from video_stream_processing_spark.functions.wavcodec import (
            decode_wav,
            encode_wav,
        )

        for pdf in batches:
            payloads = []
            for blob in pdf["payload"]:
                decoded = decode_wav(blob)
                if decoded is None:
                    payloads.append(None)
                    continue
                samples, rate = decoded
                n = samples.shape[0]
                mids = (samples[:-1] + samples[1:]) // 2  # floor division
                out = np.empty((2 * n - 1, samples.shape[1]), dtype=np.int64)
                out[0::2] = samples
                if n > 1:
                    out[1::2] = mids
                payloads.append(encode_wav(out, sample_rate=rate * 2))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return df.mapInPandas(resample, schema="doc_id long, payload binary")


# --------------------------------------------------------------------------
# Audio fingerprinting — audio-CONTENT near-dup (x139), the acoustic
# sibling of the image dHash (x135) and text SimHash (x78).
# --------------------------------------------------------------------------

AFP_FRAMES, AFP_FRAME_LEN, AFP_BANDS = 17, 8, 4  # 16x4 = 64 delta bits
_AFP_SAMPLES = AFP_FRAMES * AFP_FRAME_LEN  # 136


def afp64(samples) -> str | None:
    """64-bit audio fingerprint (the Haitsma–Kalker 2002 energy-delta
    shape, reduced to pure integers): channel 0 of the first 136
    samples is framed into 17 frames x 4 two-sample bands; each of the
    64 bits is the sign of the per-band ENERGY DELTA between
    consecutive frames (bit((f-1)*4+b) = 1 iff E(f,b) > E(f-1,b)).
    Energies are exact integer sums of squares, so a SQL oracle can
    replay the fingerprint from the synth formula; small additive
    perturbations flip only bits whose delta is near zero — the
    property that makes this a NEAR-dup signature. Clips shorter than
    136 samples return None."""
    import numpy as np

    if samples is None or samples.shape[0] < _AFP_SAMPLES:
        return None
    v = samples[:_AFP_SAMPLES, 0].astype(np.int64)
    e = (v * v).reshape(AFP_FRAMES, AFP_BANDS, 2).sum(axis=2)
    bits = e[1:] > e[:-1]
    return "".join("1" if b else "0" for b in bits.ravel())


AFP_SCHEMA = "doc_id long, sig string"


def audio_fingerprints(df: DataFrame) -> DataFrame:
    """(doc_id, payload WAV bytes) -> (doc_id, sig) via the production
    decoder (functions/wavcodec.decode_wav chunk walk) + afp64 in one
    Arrow-batched mapInPandas. Undecodable or too-short clips yield sig
    NULL (decode-or-null); audio bytes never cross a shuffle — only the
    fixed-width 64-bit fingerprint flows into the banded join, the
    stored-index posture shared with dhash_signatures."""

    def fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from video_stream_processing_spark.functions.wavcodec import decode_wav

        for pdf in batches:
            sigs = []
            for blob in pdf["payload"]:
                dec = decode_wav(bytes(blob) if blob is not None else None)
                sigs.append(None if dec is None else afp64(dec[0]))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "sig": sigs})

    return df.mapInPandas(fp, schema=AFP_SCHEMA)
