"""Roofline / speed-of-light accounting for the two flagship kernels
(VERDICT r4 #7): the Pallas fused Hamming matcher and one CG-GBA iteration.

Runs on the REAL chip (axon). Per the verify skill's axon timing gotcha,
every timed iteration threads a data dependency and fetches a checksum, so
the relay cannot elide work. Prints a markdown table for PROFILE.md.

v5e per-chip peaks used: 197 TFLOP/s bf16 (MXU), 819 GB/s HBM.
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_FLOPS = 197e12  # bf16 MXU
PEAK_BW = 819e9  # HBM bytes/s


def timed(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(jax.device_get(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        # checksum fetch: forces completion through the relay every iter
        jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / n


def roofline_row(name, t_s, flops, bytes_):
    ai = flops / max(bytes_, 1)
    bound = min(PEAK_FLOPS, PEAK_BW * ai)
    achieved = flops / t_s
    frac = achieved / bound
    regime = "compute" if PEAK_BW * ai > PEAK_FLOPS else "bandwidth"
    print(f"| {name} | {t_s*1e3:8.3f} | {flops/1e9:10.2f} | "
          f"{bytes_/1e6:8.2f} | {ai:8.1f} | {regime} | "
          f"{achieved/1e12:8.3f} | {100*frac:6.1f}% |")
    return frac


def main():
    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    print("| kernel | ms | GFLOP | MB | FLOP/B | bound | TFLOP/s | %SoL |")
    print("|---|---|---|---|---|---|---|---|")

    from orbslamm_tpu.ops.pallas import hamming as ph

    N_INNER = 50
    for N, M in ((2048, 2048), (2048, 4096), (4096, 4096)):
        da = jnp.asarray(rng.integers(0, 256, (N, 32), np.uint8))
        db = jnp.asarray(rng.integers(0, 256, (M, 32), np.uint8))
        va = jnp.ones((N,), bool)
        vb = jnp.ones((M,), bool)

        # chain N_INNER kernel invocations IN-PROGRAM (the relay's ~24 ms
        # RTT would otherwise swamp a sub-ms kernel): each iteration's
        # input depends on the previous output, one fetch at the end
        @jax.jit
        def chained(a, b, x, y):
            def body(carry, _):
                a_c = carry
                out = ph.match_tables(a_c, b, x, y)
                dep = jnp.uint8(
                    jnp.clip(out.row_best[0], 0, 1).astype(jnp.int32)
                )
                return a_c ^ dep, out.row_best[0]
            _, outs = jax.lax.scan(body, a, None, length=N_INNER)
            return outs

        def run(a=da, b=db, x=va, y=vb):
            return chained(a, b, x, y)

        t = timed(run, n=3) / N_INNER
        # bf16 matmul [N,256]x[256,M] dominates; bytes: descriptors in
        # (expanded to bf16 bits in-kernel from u8 — count the u8 HBM
        # traffic + outputs)
        flops = 2.0 * N * M * 256 + 8.0 * N * M
        bytes_ = (N + M) * 32 + (N * 3 + M * 2) * 4 + (N + M) * 256 * 2
        roofline_row(f"pallas match {N}x{M}", t, flops, bytes_)

    # one CG-GBA iteration at bench scale: K=128 cams, L=8192 points,
    # E = K*2048 observation edges (the bench map's full budget)
    from orbslamm_tpu.ops import ba

    K_, Pn, Mf = 128, 8192, 2048
    E = K_ * Mf
    pts = rng.uniform(-3, 3, (Pn, 3)).astype(np.float32)
    pts[:, 2] += 8
    Kmat = np.array([[520.9, 0, 325.1], [0, 521.0, 249.7], [0, 0, 1]],
                    np.float32)
    T = np.tile(np.eye(4, dtype=np.float32), (K_, 1, 1))
    T[:, 0, 3] = np.linspace(0, 2, K_)
    oc = np.repeat(np.arange(K_, dtype=np.int32), Mf)
    op = rng.integers(0, Pn, E).astype(np.int32)
    pc = np.einsum("eij,ej->ei", T[oc][:, :3, :3], pts[op]) + T[oc][:, :3, 3]
    uv = (pc[:, :2] / pc[:, 2:3]) * [520.9, 521.0] + [325.1, 249.7]
    prob = ba.BAProblem(
        T_cw=jnp.asarray(T),
        K=jnp.broadcast_to(jnp.asarray(Kmat), (K_, 3, 3)),
        cam_valid=jnp.ones(K_, bool),
        cam_fixed=jnp.zeros(K_, bool).at[0].set(True),
        points=jnp.asarray(pts + rng.normal(0, 0.01, pts.shape)
                           .astype(np.float32)),
        point_valid=jnp.ones(Pn, bool),
        obs_cam=jnp.asarray(oc),
        obs_point=jnp.asarray(op),
        obs_uv=jnp.asarray(uv.astype(np.float32)),
        obs_sigma2=jnp.ones(E, jnp.float32),
        obs_valid=jnp.ones(E, bool),
    )
    LM_ITERS, CG_ITERS = 2, 30
    f = jax.jit(lambda p: ba.bundle_adjust_cg(p, iters=LM_ITERS,
                                              cg_iters=CG_ITERS))
    t = timed(f, prob, n=5)
    # cost model per LM iteration (dominant edge-wise terms):
    #   residual+jacobians: ~E*400 flops; per-CG-iter schur_mv: gathers +
    #   3 einsums over E edges with 6x3 blocks ~ E*150 flops
    flops = LM_ITERS * (E * 400.0 + CG_ITERS * E * 150.0)
    # bytes: edge tables re-read per matvec (Wcp [E,6,3] f32 dominates)
    bytes_ = LM_ITERS * CG_ITERS * (E * (18 * 4 + 9 * 4 + 24))
    roofline_row(f"CG-GBA {LM_ITERS}x{CG_ITERS}it E={E}", t, flops, bytes_)
    print("\nbound = min(197 TF/s bf16, 819 GB/s x FLOP/B); %SoL = achieved "
          "/ bound.")


if __name__ == "__main__":
    main()
