#!/usr/bin/env python3
"""Independent re-implementation of the q31 multimodal-decode contract
(graft.ops.Multimodal semantics) over sf0.001 documents, pinning the
expected (media_id, media_type, n_bytes, n_frames, feature_norm) rows
to a fixture. MultimodalFixtureSpec replays the Spark pipeline and
compares row-for-row — upgrading q31 from the driver's rows-only check
to full-row parity in the repo's own gate (binary decode has no DuckDB
expression, so the oracle lives here instead).
"""
import json
import math
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq

FRAME_BYTES = 256
TYPES = ["image", "audio", "video"]


def decode_features(doc_id, text):
    payload = text.encode("utf-8")
    media_type = TYPES[doc_id % 3]
    frames = [payload[i:i + FRAME_BYTES]
              for i in range(0, len(payload), FRAME_BYTES)] if payload else []
    feats = [sum(b for b in f) / len(f) if f else 0.0 for f in frames]
    norm = math.sqrt(sum(f * f for f in feats))
    # Spark round(col, 4) = BigDecimal(Double.toString).setScale(4,
    # HALF_UP); Decimal(repr()) + ROUND_HALF_UP is the exact twin
    rounded = Decimal(repr(norm)).quantize(Decimal("0.0001"),
                                           rounding=ROUND_HALF_UP)
    return {
        "media_id": doc_id,
        "media_type": media_type,
        "n_bytes": len(payload),
        "n_frames": len(frames),
        "feature_norm": float(rounded),
    }


def main():
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"])
    rows = sorted(
        (decode_features(d["doc_id"], d["text"]) for d in t.to_pylist()),
        key=lambda r: r["media_id"])
    with open("src/test/resources/multimodal_fixture.json", "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {len(rows)} expected rows")


if __name__ == "__main__":
    main()
