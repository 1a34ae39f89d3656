"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are treated as opaque ``binary`` columns with typed
metadata columns beside them. The Ray-side plumbing — schema, actor-pool
signature, small-batch sizing for fat rows, output layout — is real and
tested; the *decoders themselves* are STUBS because no image/audio libraries
exist in this environment:

- ``decode=\"fake\"``  -> a deterministic pure-numpy pseudo-decoder (bytes ->
  seeded feature vector) so the full pipeline is executable + testable;
- ``decode=\"real\"``  -> raises NotImplementedError("no codec library ...")
  at actor construction, marking exactly where PIL/torchaudio/pyav would load.

Scale notes baked in: payloads stay in Arrow binary columns end-to-end
(``batch_format=\"pyarrow\"``; no pandas object-dtype round-trip), batch_size
for fat rows must be small (default 64) so batch x concurrency fits the heap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),  # image | audio | video
        pa.field("payload", pa.binary()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("sample_rate", pa.int32()),
        pa.field("n_frames", pa.int32()),
    ]
)


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus (binary payloads of varying size)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[np.arange(n) % 3]
    payloads = [rng.integers(0, 256, size=int(s), dtype=np.uint8).tobytes()
                for s in rng.integers(256, 4096, size=n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(rng.integers(16, 512, n).astype(np.int32)),
            "height": pa.array(rng.integers(16, 512, n).astype(np.int32)),
            "sample_rate": pa.array(np.where(kinds == "audio", 16000, 0).astype(np.int32)),
            "n_frames": pa.array(np.where(kinds == "video", rng.integers(10, 100, n), 0).astype(np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


class MediaFeaturizer:
    """Actor-pool stage: binary payload -> fixed-size feature vector.

    The actor-pool shape is the real deliverable: heavy decoder state loads
    once per actor in ``__init__`` (T1/T5 stateful-stage analog), work is
    per-batch, batches stay Arrow. Use
    ``ds.map_batches(MediaFeaturizer, fn_constructor_kwargs=..., batch_size=64,
    concurrency=N, num_cpus=1, batch_format="pyarrow")``.
    """

    def __init__(self, dim: int = 32, decode: str = "fake"):
        if decode == "real":
            raise NotImplementedError(
                "no image/audio codec library in this environment; "
                "plug PIL/torchaudio/pyav here (loaded once per actor)"
            )
        if decode != "fake":
            raise ValueError(f"unknown decode mode: {decode}")
        self.dim = dim
        # deterministic projection matrix = the 'model' loaded once per actor
        rng = np.random.default_rng(1234)
        self.proj = rng.standard_normal((256, dim))

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = np.zeros((batch.num_rows, self.dim), dtype=np.float32)
        payloads = batch["payload"]
        for i in range(batch.num_rows):  # rows are FAT (KB..MB); loop is per-payload decode
            buf = np.frombuffer(payloads[i].as_py(), dtype=np.uint8)
            hist = np.bincount(buf, minlength=256).astype(np.float64)
            hist /= max(hist.sum(), 1.0)
            feats[i] = (hist @ self.proj).astype(np.float32)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "feature": pa.array(list(feats)),
            }
        )


def featurize(ds, dim: int = 32, concurrency: int = 2, batch_size: int = 64):
    """The standard multimodal pipeline: actor pool, small batches, Arrow I/O."""
    return ds.map_batches(
        MediaFeaturizer,
        fn_constructor_kwargs={"dim": dim, "decode": "fake"},
        batch_format="pyarrow",
        batch_size=batch_size,
        # (1, n) autoscaling: fixed pools == CPU budget deadlock vs downstream
        # task stages; see engine/ops/dedup.py.
        concurrency=(1, concurrency),
        num_cpus=1,
    )
