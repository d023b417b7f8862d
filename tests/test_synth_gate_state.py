"""State management of the quality-gate harness (examples/train_synthetic.py).

The gate reads the CLI's persisted best-score records, which are
double-gated on history (reference Engine.py:157-163 semantics) — so a
reused root must be reset or the gate compares a stale XE best against a
fresh SCST run.  Observed live: a 3-epoch re-run inherited a stronger
5-epoch run's best checkpoint and deterministically repeated its SCST,
producing a false FAIL.  These tests pin reset_root_state's contract."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples.train_synthetic import reset_root_state


def _make_root(tmp_path, n_images=5):
    root = tmp_path / "SynthRoot"
    (root / "images").mkdir(parents=True)
    (root / "modified_annotations").mkdir()
    (root / "Data").mkdir()
    ck_nic = root / "CheckPoints" / "Model_NIC_Dataset_Flickr8K"
    ck_butd = root / "CheckPoints" / "Model_BUTDSpatial_Dataset_Flickr8K"
    ck_nic.mkdir(parents=True)
    ck_butd.mkdir()
    (root / "dataset_synth.json").write_text("{}")
    (root / "scene_meta.json").write_text(
        json.dumps({str(i): {} for i in range(n_images)}))
    (root / "caption_vocab.pkl").write_bytes(b"x")
    (ck_nic / "marker").write_text("old nic state")
    (ck_butd / "marker").write_text("old butd state")
    return root


def test_matching_size_clears_only_target_model_checkpoints(tmp_path):
    root = _make_root(tmp_path, n_images=5)
    regen = reset_root_state(str(root), 5, "NIC", skip_xe=False)
    assert regen is False
    assert not (root / "CheckPoints"
                / "Model_NIC_Dataset_Flickr8K").exists()
    # other models' state and the dataset itself are untouched
    assert (root / "CheckPoints"
            / "Model_BUTDSpatial_Dataset_Flickr8K" / "marker").exists()
    assert (root / "dataset_synth.json").exists()
    assert (root / "caption_vocab.pkl").exists()


def test_skip_xe_preserves_checkpoints(tmp_path):
    root = _make_root(tmp_path, n_images=5)
    regen = reset_root_state(str(root), 5, "NIC", skip_xe=True)
    assert regen is False
    assert (root / "CheckPoints"
            / "Model_NIC_Dataset_Flickr8K" / "marker").exists()


def test_size_mismatch_wipes_all_derived_state(tmp_path):
    root = _make_root(tmp_path, n_images=5)
    regen = reset_root_state(str(root), 7, "NIC", skip_xe=False)
    assert regen is True
    for sub in ("dataset_synth.json", "scene_meta.json", "images",
                "modified_annotations", "caption_vocab.pkl", "Data",
                "CheckPoints"):
        assert not (root / sub).exists(), sub


def test_fresh_root_requests_generation(tmp_path):
    root = tmp_path / "empty"
    root.mkdir()
    assert reset_root_state(str(root), 5, "NIC", skip_xe=False) is True


def test_zipf_flag_mismatch_forces_regen(tmp_path):
    # pre-flag roots (no dataset_flags.json) are uniform: asking for a
    # zipf gate on one must regenerate the dataset
    root = _make_root(tmp_path, n_images=5)
    assert reset_root_state(str(root), 5, "NIC", skip_xe=False,
                            zipf=True) is True


def test_zipf_flag_match_reuses_root(tmp_path):
    root = _make_root(tmp_path, n_images=5)
    (root / "dataset_flags.json").write_text(
        json.dumps({"zipf": True, "n_images": 5}))
    assert reset_root_state(str(root), 5, "NIC", skip_xe=False,
                            zipf=True) is False
    # and a uniform request on the same zipf root regenerates
    assert reset_root_state(str(root), 5, "NIC", skip_xe=False,
                            zipf=False) is True


def test_preflag_uniform_root_reused_for_uniform_gate(tmp_path):
    root = _make_root(tmp_path, n_images=5)
    assert reset_root_state(str(root), 5, "NIC", skip_xe=False,
                            zipf=False) is False
