"""Failure detection & elastic recovery (parallel/elastic.py).

The property under test is the strong one the design buys: after losing
half the mesh mid-render, the finished image is BIT-IDENTICAL to an
uninterrupted single-mesh render — global sample indices + stateless RNG
make completed work location-independent (SURVEY.md §5: the reference has
no failure handling at all)."""
import numpy as np
import pytest

import jax

from sail_tpu import scenes
from sail_tpu.core.vecmath import Vec3
from sail_tpu.parallel.elastic import DeviceFailure, ElasticRenderer, probe_devices
from sail_tpu.parallel.mesh import make_mesh
from sail_tpu.parallel.render_sharded import render_sharded

SIZE = 16
SPP = 4
BOUNCES = 2


@pytest.fixture(scope="module")
def setup():
    packed, static = scenes.cornell_matte().pack()
    mesh = make_mesh()  # all 8 virtual devices
    ref = render_sharded(packed, static, mesh, SIZE, SIZE, SPP, seed=0,
                         max_bounces=BOUNCES)
    ref = np.asarray(ref.stack())
    return packed, static, ref


def test_probe_devices_filters_faulty():
    devs = jax.devices()
    healthy = probe_devices(devs, faulty=lambda d: d.id % 2 == 1)
    assert [d.id for d in healthy] == [d.id for d in devs if d.id % 2 == 0]


def test_elastic_render_no_faults_matches(setup):
    packed, static, ref = setup
    er = ElasticRenderer(packed, static, SIZE, SIZE, max_bounces=BOUNCES)
    img = er.render(SPP, seed=0, chunk_spp=2)
    np.testing.assert_array_equal(np.asarray(img.stack()), ref)
    assert er.events == []


def test_elastic_survives_device_loss_bit_identical(setup):
    packed, static, ref = setup
    dead = {d.id for d in jax.devices()[4:]}  # second half of the mesh dies
    tripped = []

    def fault_hook(chunk):
        if chunk == 1 and not tripped:
            tripped.append(True)
            raise DeviceFailure("injected: device powered off")

    er = ElasticRenderer(packed, static, SIZE, SIZE, max_bounces=BOUNCES,
                         fault_hook=fault_hook,
                         faulty=lambda d: d.id in dead)
    img = er.render(SPP, seed=0, chunk_spp=2)
    # failure was detected, the mesh shrank, and the result is unchanged
    assert any(e["event"] == "mesh_shrink" for e in er.events)
    assert len(er.devices) == 4
    np.testing.assert_array_equal(np.asarray(img.stack()), ref)


def test_elastic_gives_up_when_nothing_healthy(setup):
    packed, static, _ = setup

    def fault_hook(chunk):
        raise DeviceFailure("injected: total outage")

    er = ElasticRenderer(packed, static, SIZE, SIZE, max_bounces=BOUNCES,
                         fault_hook=fault_hook, faulty=lambda d: True,
                         max_retries=2)
    with pytest.raises(DeviceFailure):
        er.render(SPP, seed=0, chunk_spp=2)
