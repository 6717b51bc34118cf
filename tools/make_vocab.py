"""Generate the framework's pretrained vocabulary data file.

The reference ships a pretrained DBoW2 tree (ORBvoc.txt, ~1M words trained
offline on generic imagery; build.sh:28-31 unpacks it, System.cc:167 loads
it). This tool is the training counterpart: it extracts ORB descriptors from
a diverse pool of rendered synthetic scenes and trains the hierarchical
k-majority vocabulary on them, saving a compact .npz the sessions load via
``SlamConfig.vocabulary_path``.

Usage:  python tools/make_vocab.py [branching] [depth] [out.npz]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from orbslamm_tpu.io.synthetic import make_sequence
    from orbslamm_tpu.ops import bow, orb as orb_ops
    from orbslamm_tpu.utils.config import CameraConfig, OrbConfig

    branching = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    out = (
        Path(sys.argv[3])
        if len(sys.argv) > 3
        else Path(__file__).resolve().parent.parent
        / "orbslamm_tpu"
        / "data"
        / f"vocab_{branching}x{depth}.npz"
    )

    cam = CameraConfig(width=640, height=480, fx=520.9, fy=521.0, cx=325.1,
                       cy=249.7)
    extract = orb_ops.make_extractor(
        OrbConfig(n_features=1000, max_keypoints=2048), cam
    )
    descs = []
    # a spread of worlds (seeds), viewpoints (frame strides) and motions so
    # the words cover the descriptor distribution, not one scene
    for seed in range(8):
        for motion in ("forward", "strafe", "orbit"):
            try:
                seq = make_sequence(n_frames=12, n_points=2500, cam=cam,
                                    seed=seed * 31 + 7, motion=motion)
            except Exception:
                continue
            for i in range(0, 12, 3):
                f = extract(seq.images[i])
                d = np.asarray(f.desc)[np.asarray(f.valid)]
                descs.append(d)
    alld = np.concatenate(descs, axis=0)
    print(f"training on {len(alld)} descriptors -> {branching}^{depth} words")
    voc = bow.build_vocabulary(alld, branching=branching, depth=depth,
                               iters=8, seed=3, max_train=32768)
    out.parent.mkdir(parents=True, exist_ok=True)
    bow.save_vocabulary_npz(voc, out)
    print(f"saved {out} ({out.stat().st_size/1024:.0f} KiB)")


if __name__ == "__main__":
    main()
