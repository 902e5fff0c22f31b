"""Train-loop wiring: in-training eval sweep, TB events, snapshots, and the
host MixedMaskEmbedder path feeding the jitted step's mask input
(reference train.py:532-544,679-701,718-882; augmenter.py:173-176)."""

import json
import os

import numpy as np
import pytest


def _run_train(tmp_path, extra):
    from videoseal_tpu.train import get_parser, main
    args = get_parser().parse_args([
        "--synthetic", "1", "--steps", "6", "--tiny", "1", "--cpu", "1",
        "--batch_size", "8", "--iter_per_epoch", "3",
        "--output_dir", str(tmp_path), *extra])
    return main(args)


class TestInTrainEval:
    def test_eval_rows_tb_and_snapshots(self, tmp_path):
        _run_train(tmp_path, ["--eval_freq", "1", "--eval_samples", "2",
                              "--eval_augs", "subset"])
        rows = [json.loads(l) for l in
                open(os.path.join(tmp_path, "eval.jsonl"))]
        assert len(rows) == 2                      # 6 steps / 3 per epoch
        for r in rows:
            assert "psnr" in r and "ssim" in r
            assert "bit_acc_identity_0" in r
            assert "bit_acc_crop_0.71" in r        # subset grid rows
            assert 0.0 <= r["bit_acc_identity_0"] <= 1.0
        tb = os.path.join(tmp_path, "tensorboard")
        events = [f for f in os.listdir(tb) if f.startswith("events.out")]
        assert events and os.path.getsize(os.path.join(tb, events[0])) > 0
        snaps = os.listdir(os.path.join(tmp_path, "snapshots"))
        assert any(s.endswith("_wm.png") for s in snaps)
        assert any(s.endswith("_diff.png") for s in snaps)

    def test_geometric_grid_rows(self, tmp_path):
        """--eval_augs geometric logs rotate/perspective trajectory rows."""
        _run_train(tmp_path, ["--eval_freq", "2", "--eval_samples", "2",
                              "--eval_augs", "geometric"])
        rows = [json.loads(l) for l in
                open(os.path.join(tmp_path, "eval.jsonl"))]
        assert len(rows) == 1
        for k in ("bit_acc_rotate_10", "bit_acc_rotate_30",
                  "bit_acc_crop_0.5", "bit_acc_perspective_0.3",
                  "bit_acc_perspective_0.5", "bit_acc_jpeg_60"):
            assert k in rows[0], (k, sorted(rows[0]))

    def test_eval_freq_zero_disables(self, tmp_path):
        _run_train(tmp_path, ["--eval_freq", "0"])
        assert not os.path.exists(os.path.join(tmp_path, "eval.jsonl"))


class TestHostMaskWiring:
    def test_mixed_masks_feed_the_step(self, tmp_path, monkeypatch):
        """kind 'mixed' routes through masks_host.MixedMaskEmbedder and the
        batch masks reach the augmenter (not the on-device stand-ins)."""
        import yaml
        import videoseal_tpu.augmentation.masks_host as mh

        calls = []
        orig = mh.MixedMaskEmbedder.__call__

        def spy(self, imgs, masks=None, **kw):
            out = orig(self, imgs, masks, **kw)
            calls.append(np.asarray(out))
            return out

        monkeypatch.setattr(mh.MixedMaskEmbedder, "__call__", spy)
        cfg = {"masks": {"kind": "mixed"},
               "augs": {"identity": 1},
               "augs_params": {}}
        p = tmp_path / "augs.yaml"
        p.write_text(yaml.safe_dump(cfg))
        _run_train(tmp_path, ["--eval_freq", "0",
                              "--augmentation_config", str(p)])
        assert len(calls) == 6                     # one per step
        m = calls[0]
        assert m.shape[-1] == 1 and m.dtype == np.float32
        assert set(np.unique(m)) <= {0.0, 1.0}

    def test_mixed_device_still_routes_on_device(self, tmp_path):
        import yaml
        cfg = {"masks": {"kind": "mixed_device"},
               "augs": {"identity": 1}, "augs_params": {}}
        p = tmp_path / "augs.yaml"
        p.write_text(yaml.safe_dump(cfg))
        _run_train(tmp_path, ["--eval_freq", "0",
                              "--augmentation_config", str(p)])
