"""The hardware kernel-verification gate must stay runnable.

On CI (CPU backend) both sides of every check run in interpret/XLA-CPU mode,
so this doesn't prove Mosaic lowering — bench.py on the real chip does that —
but it DOES prove the harness exercises every production kernel call path
with current APIs.  A refactor that breaks a check's plumbing fails here
instead of silently turning the driver's TPU gate into a no-op.
"""

from coherence_tpu.utils import tpu_smoke


def test_smoke_harness_green_on_cpu():
    res = tpu_smoke.run(seed=0)
    assert res["failures"] == [], res["failures"]
    assert res["kernels_verified"] == res["kernels_total"] >= 18
    assert res["compiled"] is False  # conftest forces the CPU backend
