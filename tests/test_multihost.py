"""Multi-host helpers on the virtual 8-device mesh (§5.8): host-aware mesh
construction, barrier, control-payload exchange, pytree broadcast."""

import jax
import numpy as np

from orbslamm_tpu.parallel import multihost as mh


def test_host_mesh_axes():
    mesh = mh.host_mesh()
    assert mesh.axis_names == ("host", "chip")
    # single process: one host row spanning all local devices
    assert mesh.devices.shape[0] == 1
    assert mesh.devices.shape[1] == len(jax.devices())


def test_stream_mesh_flat():
    mesh = mh.stream_mesh()
    assert mesh.axis_names == ("d",)
    assert mesh.devices.size == len(jax.devices())


def test_barrier_and_payload_roundtrip():
    mh.barrier()  # must not hang or raise on any device count
    out = mh.all_gather_bytes(b"merge:map3->map0")
    assert out == [b"merge:map3->map0"]
    tree = {"voc": np.arange(4), "id": 7}
    back = mh.broadcast_pytree(tree)
    assert back["id"] == 7 and (back["voc"] == np.arange(4)).all()


def test_initialize_noop_single_process():
    mh.initialize()  # no coordinator configured: silent no-op
    assert jax.process_count() == 1
