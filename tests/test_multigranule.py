"""Multi-granule pod-scale training (training/multi.py): G granules, each
with its own model, trained concurrently on disjoint device groups."""

import json

import jax
import numpy as np
import pytest

from atmonr_tpu.data.harp2 import HARP2Dataset
from atmonr_tpu.data.synthetic import make_synthetic_granule
from atmonr_tpu.parallel.mesh import make_mesh
from atmonr_tpu.pipelines import get_pipeline
from atmonr_tpu.training import Trainer
from atmonr_tpu.training.multi import partition_devices, train_granules

from tests.test_pipelines import DATASET_CONFIG, NGP_CONFIG
from tests.test_training import TRAINER_CONFIG


def test_partition_devices():
    groups = partition_devices(2)
    assert len(groups) == 2
    assert len(groups[0]) == len(groups[1]) == 4  # 8 virtual devices
    assert not set(map(id, groups[0])) & set(map(id, groups[1]))
    # more granules than devices: groups share devices round-robin
    lone = partition_devices(3, devices=jax.devices()[:2])
    assert [len(g) for g in lone] == [1, 1, 1]


@pytest.mark.slow
def test_train_granules_concurrent(tmp_path):
    """Two granules (different synthetic scenes), each sharded data=2 over
    its own 4-device group: both train, checkpoint, and learn *different*
    models; losses decrease for both."""
    granules = [
        make_synthetic_granule(height=10, width=8, views_per_band=2, seed=0),
        make_synthetic_granule(height=8, width=10, views_per_band=2, seed=7),
    ]
    groups = partition_devices(2)
    trainers, outs = [], []
    cfg = dict(TRAINER_CONFIG, num_iters=24)
    for g, granule in enumerate(granules):
        ds = HARP2Dataset(DATASET_CONFIG, granule)
        pipe = get_pipeline(NGP_CONFIG, ds)
        t = Trainer(cfg, ds, pipe, f"mg{g}", data_root=tmp_path, seed=g)
        t.shard(make_mesh(data=2, sample=2, devices=groups[g]))
        trainers.append(t)
        outs.append(tmp_path / f"granule_{g}")
    train_granules(trainers, outs)

    for g, t in enumerate(trainers):
        assert t.iter_count == t.num_iters
        # each granule checkpointed independently
        assert any((outs[g]).iterdir())
        lines = next(
            (tmp_path / "tensorboard").glob(f"mg{g}_*/metrics.jsonl")
        ).read_text().splitlines()
        losses = [
            json.loads(ln)["value"]
            for ln in lines
            if json.loads(ln)["tag"] == "Loss"
        ]
        assert losses[-1] < losses[0]

    # different scenes -> different trained tables
    w0 = np.asarray(trainers[0].state["params"]["pos_table"])
    w1 = np.asarray(trainers[1].state["params"]["pos_table"])
    assert not np.allclose(w0, w1)


def test_single_device_group_placement(tmp_path):
    """A one-device group must still be sharded onto ITS device — otherwise
    all granules land on the default device and never overlap (advisor
    finding r1)."""
    target = jax.devices()[3]
    granule = make_synthetic_granule(height=8, width=8, views_per_band=2)
    ds = HARP2Dataset(DATASET_CONFIG, granule)
    pipe = get_pipeline(NGP_CONFIG, ds)
    t = Trainer(dict(TRAINER_CONFIG, num_iters=2), ds, pipe, "sg", data_root=tmp_path)
    t.shard(make_mesh(devices=[target]))
    for arr in jax.tree.leaves(t.rays):
        assert arr.devices() == {target}
    for arr in jax.tree.leaves(t.state["params"]):
        assert arr.devices() == {target}
    t.train(tmp_path / "out")
    assert t.iter_count == t.num_iters
