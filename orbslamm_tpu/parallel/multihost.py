"""Multi-host deployment: process coordination + host-aware meshes (§5.8).

The reference's "communication backend" is shared-memory mutexes inside ONE
process (SURVEY.md §2.3 C1 — multiple Systems share a MultiMapper pointer;
no sockets/MPI anywhere). The TPU-native counterpart at multi-host scale is
the standard JAX single-program multi-controller model:

  * every host runs THIS same program; ``initialize()`` wires them through
    the JAX distributed runtime (coordination service on host 0);
  * a host-aware ``Mesh`` places a ``host`` axis over DCN and a ``chip``
    axis over each host's ICI — robot streams (parallel/streams.StreamBank)
    shard their robot axis over ``host`` (zero cross-host collectives
    between merges: robots are independent), while the kf-sharded global BA
    (parallel/dist_ba.make_kf_sharded_gba) shards keyframe blocks over
    ``chip`` so its per-iteration psums ride ICI, not DCN;
  * cross-host control traffic (merge notifications, keyframe-rate events)
    is tiny and rides the collectives in ``all_gather_bytes`` /
    ``barrier`` below — the mutex/usleep analog.

Single-host processes (tests, the axon dev chip) skip initialization and
get degenerate (1-host) meshes; everything downstream is shape-identical,
which is what lets the virtual-device dryrun exercise the same code.
"""

from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join the multi-controller runtime (jax.distributed.initialize).

    With no arguments, environment-based auto-detection is used (TPU pod
    slices set everything up from the metadata server). Safe to call in a
    single-process run: it is a no-op when no coordinator is configured."""
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except Exception:
            return  # single-process (dev chip / CPU tests)
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def host_mesh(devices=None) -> Mesh:
    """[host, chip] mesh: the ``host`` axis crosses DCN, the ``chip`` axis
    stays inside each host's ICI domain.

    Shard robot-stream axes over ``host`` (independent between merges) and
    keyframe blocks / BA edges over ``chip`` (per-iteration collectives)."""
    devices = list(jax.devices()) if devices is None else list(devices)
    by_host: dict[int, list] = {}
    for d in devices:
        by_host.setdefault(getattr(d, "process_index", 0), []).append(d)
    n_host = len(by_host)
    per_host = min(len(v) for v in by_host.values())
    grid = np.array(
        [v[:per_host] for _, v in sorted(by_host.items())], dtype=object
    )
    return Mesh(grid, ("host", "chip"))


def stream_mesh(devices=None) -> Mesh:
    """Flat mesh over every device for robot-parallel StreamBank sharding
    (one robot slice per device; no collectives on the tracking hot path)."""
    devices = list(jax.devices()) if devices is None else list(devices)
    return Mesh(np.array(devices), ("d",))


def barrier(name: str = "") -> None:
    """Cross-host barrier: a tiny device all-reduce across all processes —
    the analog of the reference's finish/stop handshakes
    (MultiMapper.cc:954-971)."""
    dev = jax.devices()
    if len(dev) == 1:
        return
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(dev), ("i",))
    xs = jax.device_put(jnp.ones((len(dev),)), NamedSharding(mesh, P("i")))
    jax.block_until_ready(jnp.sum(xs))  # GSPMD inserts the all-reduce


def all_gather_bytes(payload: bytes, max_len: int = 1 << 16) -> list[bytes]:
    """Exchange small host-side control payloads (merge notifications,
    keyframe headers) between ALL processes through one padded u8
    all-gather — the multi-host replacement for the reference's shared
    MultiMapper pointer. Every process must call this collectively."""
    n_proc = jax.process_count()
    if n_proc == 1:
        return [payload]
    buf = np.zeros(max_len + 4, np.uint8)
    ln = len(payload)
    if ln > max_len:
        raise ValueError(f"payload {ln} > max_len {max_len}")
    buf[:4] = np.frombuffer(np.uint32(ln).tobytes(), np.uint8)
    buf[4 : 4 + ln] = np.frombuffer(payload, np.uint8)
    from jax.experimental import multihost_utils

    gathered = np.asarray(
        multihost_utils.process_allgather(jnp.asarray(buf))
    ).reshape(n_proc, -1)
    out = []
    for row in gathered:
        k = int(np.frombuffer(row[:4].tobytes(), np.uint32)[0])
        out.append(row[4 : 4 + k].tobytes())
    return out


def broadcast_pytree(tree, source: int = 0):
    """Replicate a small host pytree from ``source`` to every process
    (vocabulary, config digests) — pickle over all_gather_bytes."""
    if jax.process_count() == 1:
        return tree
    payload = pickle.dumps(tree) if jax.process_index() == source else b""
    return pickle.loads(all_gather_bytes(payload)[source])
