"""Train and ship the ORB and LBD (line) vocabularies.

The reference loads two pre-trained DBoW2 vocabularies at startup
(ORBvoc.txt + LSvoc.txt, src/System.cc:83-105); the files themselves are
absent from the mount, so we train our own with hierarchical binary
k-means (vocabulary.train) on descriptors harvested from:
  * many synthetic-room renders across varied scenes/viewpoints, and
  * the real images shipped with the reference's prior-map sets
    (/root/reference/data{,2}/color/*.png).

Outputs plvio_tpu/assets/orbvoc.npz and lbdvoc.npz (packed sign bits).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from plvio_tpu.io import synthetic as syn
from plvio_tpu.models import vocabulary as V
from plvio_tpu.ops import frontend as FE
from plvio_tpu.ops import lines as LN

ASSETS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "..", "plvio_tpu", "assets")


def harvest(n_scenes=4, n_frames_per=12, seed=0):
    orb_descs, lbd_descs = [], []
    extract, _ = FE.make_extractor(480, 752, n_features=1000)
    for s in range(n_scenes):
        rng = np.random.default_rng(seed + 101 * s)
        scene = syn.make_room_scene(rng, n_points=4000, n_lines=80)
        traj = syn.make_orbit_trajectory(duration=n_frames_per / 4.0,
                                         fps=4.0, radius=0.5 + 0.2 * s)
        for i in range(n_frames_per):
            img = syn.render_frame(scene, traj.R_wb[i], traj.p_wb[i],
                                   rng=rng)
            f = extract(jnp.asarray(img, jnp.float32))
            v = np.asarray(f.valid)
            orb_descs.append(np.asarray(f.desc, np.float32)[v])
            lf = LN.extract_lines(jnp.asarray(img, jnp.float32),
                                  max_lines=256)
            lv = np.asarray(lf.valid)
            lbd_descs.append(np.asarray(lf.desc, np.float32)[lv])
        print(f"scene {s}: {sum(len(d) for d in orb_descs)} ORB, "
              f"{sum(len(d) for d in lbd_descs)} LBD so far")

    # real images from the reference's prior sets
    from plvio_tpu.io.euroc import load_image_gray
    extract_vga = None
    for dirname in ("/root/reference/data/color",
                    "/root/reference/data2/color"):
        if not os.path.isdir(dirname):
            continue
        for fn in sorted(os.listdir(dirname)):
            img = load_image_gray(os.path.join(dirname, fn))
            if extract_vga is None:
                extract_vga, _ = FE.make_extractor(
                    img.shape[0], img.shape[1], n_features=1000)
            f = extract_vga(jnp.asarray(img, jnp.float32))
            v = np.asarray(f.valid)
            orb_descs.append(np.asarray(f.desc, np.float32)[v])
            lf = LN.extract_lines(jnp.asarray(img, jnp.float32),
                                  max_lines=256)
            lv = np.asarray(lf.valid)
            lbd_descs.append(np.asarray(lf.desc, np.float32)[lv])
    return np.concatenate(orb_descs), np.concatenate(lbd_descs)


def main():
    os.makedirs(ASSETS, exist_ok=True)
    t0 = time.time()
    orb, lbd = harvest()
    print(f"harvested {len(orb)} ORB + {len(lbd)} LBD descriptors "
          f"({time.time()-t0:.0f}s)")

    voc_orb = V.train(jnp.asarray(orb), seed=0, k=10, depth=4, iters=8)
    V.save(voc_orb, os.path.join(ASSETS, "orbvoc.npz"))
    print(f"ORB vocabulary: k=10 depth=4 ({voc_orb.n_words} words)")

    # lines are ~5x rarer per frame; a k=10 depth=3 tree (1000 words)
    # matches the reference's smaller LSvoc
    voc_lbd = V.train(jnp.asarray(lbd), seed=1, k=10, depth=3, iters=8)
    V.save(voc_lbd, os.path.join(ASSETS, "lbdvoc.npz"))
    print(f"LBD vocabulary: k=10 depth=3 ({voc_lbd.n_words} words)")
    print(f"total {time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
