"""Overfit gate as a regression test (VERDICT r2 #1): the framework must
actually LEARN — a few hundred optimizer steps on a tiny learnable fixture
must drive the loss well below its starting value and push train-split
COCO segm mAP up through the real metrics path.

This is the CPU-scale twin of ``tools/overfit_gate.py`` (which runs the
same gate at swin-tiny scale on the real chip and checks in the run
record under tools/records/). It fails on any non-learning regression:
matcher churn under cost ties, RNG-fold correlations between steps,
augmentation/label misalignment, optimizer wiring bugs.

Reference workload being miniaturized: the 100-epoch fine-tune with final
mAP in /root/reference/models/mask2former/train.py:187-258.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))


@pytest.mark.slow
def test_overfit_tiny_fixture(tmp_path):
    from overfit_gate import run_gate

    record = run_gate(
        str(tmp_path), arch='tiny-test', steps=220, lr=2e-4, hw=96,
        batch=2, n_images=4, dtype='float32', log_every=20,
    )
    # learnability: the loss must fall hard (>2x), not merely wiggle
    assert record['final_loss'] < 0.5 * record['initial_loss'], record
    # and the model must actually segment its training set: mAP@50 through
    # the full postprocess + MeanAveragePrecision path must come up off 0.
    assert record['map_50'] >= float(os.environ.get('OG_TEST_MAP50_MIN', '0.3')), record
