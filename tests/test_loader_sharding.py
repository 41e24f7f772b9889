"""Multi-host loader sharding and remat/validation trainer options."""

import numpy as np
import jax

from fal_net_tpu.data.loader import DataLoader
from fal_net_tpu.parallel.mesh import make_mesh
from fal_net_tpu.train import Stage1Config, Trainer
from tests.test_train import SyntheticStereo, _tiny_cfg


class IndexDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def get(self, i, rng):
        return {"idx": np.int32(i)}


def test_host_shards_are_disjoint_and_cover():
    n, shards = 24, 3
    seen = []
    for sid in range(shards):
        dl = DataLoader(
            IndexDataset(n), batch_size=2, shuffle=True, seed=5,
            shard_id=sid, num_shards=shards, num_workers=2,
        )
        assert len(dl) == (n // shards) // 2
        for batch in dl:
            seen.extend(batch["idx"].tolist())
    assert sorted(seen) == list(range(n))


def test_host_shards_lockstep_shuffle():
    """Same seed/epoch -> hosts slice one shared permutation."""
    dls = [
        DataLoader(IndexDataset(12), batch_size=2, shuffle=True, seed=9,
                   shard_id=s, num_shards=2, num_workers=1)
        for s in range(2)
    ]
    for dl in dls:
        dl.set_epoch(4)
    a = [i for b in dls[0] for i in b["idx"].tolist()]
    b = [i for b in dls[1] for i in b["idx"].tolist()]
    assert set(a).isdisjoint(b)
    assert len(a) == len(b) == 6


def test_remat_trainer_runs(tmp_path):
    cfg = Stage1Config(**_tiny_cfg(epoch_size=2), remat=True)
    tr = Trainer(cfg, stage="stage1", mesh=make_mesh(2), train_dataset=SyntheticStereo(n=4))
    res = tr.fit(save_path=str(tmp_path / "r"))
    assert np.isfinite(res["history"][0]["loss"])


def test_validate_batched_identity():
    """Batched epoch validation (val_batch_size>1) produces the same
    metrics as the per-sample loop — 5 samples, batch 4 => one full batch
    + ragged tail (VERDICT round-2 item 4)."""

    class ValDS:
        def __len__(self):
            return 5

        def get(self, i, rng_=None):
            r = np.random.default_rng(100 + i)
            disp = (r.random((32, 1242, 1)) * 20).astype(np.float32)
            disp[disp < 5] = 0
            return {
                "left": r.random((32, 1242, 3)).astype(np.float32) - 0.4,
                "right": r.random((32, 1242, 3)).astype(np.float32) - 0.4,
                "targets": [disp],
            }

    cfg = Stage1Config(**_tiny_cfg(epoch_size=1))
    tr = Trainer(
        cfg, stage="stage1", mesh=make_mesh(1),
        train_dataset=SyntheticStereo(n=2), val_dataset=ValDS(),
    )
    tr.setup()
    cfg.val_batch_size = 1
    m1 = tr.validate(ValDS())
    cfg.val_batch_size = 4
    m4 = tr.validate(ValDS())
    for k in m1:
        np.testing.assert_allclose(m4[k], m1[k], rtol=1e-5, atol=1e-6, err_msg=k)


def test_validate_with_images(tmp_path, rng):
    class ValDS:
        def __len__(self):
            return 1

        def get(self, i, rng_=None):
            r = np.random.default_rng(0)
            disp = (r.random((32, 1242, 1)) * 20).astype(np.float32)
            disp[disp < 5] = 0
            return {
                "left": r.random((32, 1242, 3)).astype(np.float32) - 0.4,
                "right": r.random((32, 1242, 3)).astype(np.float32) - 0.4,
                "targets": [disp],
            }

    cfg = Stage1Config(**_tiny_cfg(epoch_size=1))
    tr = Trainer(
        cfg, stage="stage1", mesh=make_mesh(1),
        train_dataset=SyntheticStereo(n=2), val_dataset=ValDS(),
    )
    res = tr.fit(save_path=str(tmp_path / "v"))
    h = res["history"][0]
    assert np.isfinite(h["rmse"]) and np.isfinite(h["epe"]) and "abs_rel" in h

    # Logged image set mirrors Train_Stage1_K.py:322-338: input left at
    # epoch 0 only, then disparity / both sub-occ masks / pan each epoch.
    class RecLogger:
        def __init__(self):
            self.tags = []

        def image(self, step, tag, arr):
            assert np.asarray(arr).ndim == 3
            self.tags.append((int(step), tag))

    rec = RecLogger()
    tr.logger = rec
    tr.validate(ValDS(), epoch=0)
    assert {t for _, t in rec.tags} == {
        "val0/input_left",
        "val0/disparity",
        "val0/maskL",
        "val0/maskR",
        "val0/pan",
    }
    rec.tags.clear()
    tr.validate(ValDS(), epoch=1)
    assert {t for _, t in rec.tags} == {
        "val0/disparity",
        "val0/maskL",
        "val0/maskR",
        "val0/pan",
    }
