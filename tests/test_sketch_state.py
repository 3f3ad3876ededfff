"""Sketch state in the checkpoint manifest: persist, reload, merge."""

import numpy as np
import pytest

from taco_toolbox_spark.checkpoint import (
    CheckpointManifest,
    merged_quantiles_from_manifest,
    record_sketch_state,
)

PROBES = (0.1, 0.5, 0.9)


def test_sketch_roundtrip_and_merge(tmp_path, corpus, clean_pdf):
    path = str(tmp_path / "m.json")
    m = CheckpointManifest.load_or_create(path, "r", "mem://c")
    record_sketch_state(m, corpus.clean, "length(text)")
    m.save()

    m2 = CheckpointManifest.load_or_create(path, "r", "mem://c")
    some_part = next(iter(m2.doc["partitions"]))
    sk = m2.doc["partitions"][some_part]["sketch"]["length(text)"]
    assert sk["n"] > 0 and len(sk["means"]) == len(sk["weights"])

    q = merged_quantiles_from_manifest(m2, "length(text)", PROBES)
    exact = np.quantile(clean_pdf["text"].str.len().to_numpy(), PROBES)
    assert np.allclose(q, exact, rtol=0.1, atol=2.0)
    # total weight across partitions == total rows
    total = sum(
        rec["sketch"]["length(text)"]["n"]
        for rec in m2.doc["partitions"].values()
    )
    assert total == len(clean_pdf)
