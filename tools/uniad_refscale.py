"""UniAD at the REFERENCE config on real TPU (VERDICT r2 #7).

200x200 BEV, 901 queries, 256 dims, 6+6 layers, R101 (3,4,23,3),
6 cams at 928x1600 (nuScenes scale): single-frame tracked inference,
then one clip-train step at a reduced-but-substantial image size.

Honest protocol: chained distinct frames, forced by a scalar fetch.
Usage: python _scratch_uniad_refscale.py [infer|train] [--img H W]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from sndepth_tpu.models.uniad_track import uniad_reference_config

mode = sys.argv[1] if len(sys.argv) > 1 else "infer"
if "--img" in sys.argv:
    i = sys.argv.index("--img")
    H, W = int(sys.argv[i + 1]), int(sys.argv[i + 2])
else:
    H, W = (928, 1600) if mode == "infer" else (224, 416)

kw = {}
if "--bf16" in sys.argv:
    # f32 single-frame inference at 6x928x1600 needs 36.7G of HBM
    # (measured compile OOM vs the chip's 15.75G); bf16 halves the
    # activation footprint.
    kw["dtype"] = jnp.bfloat16
model = uniad_reference_config(**kw)
rng = np.random.RandomState(0)

if mode == "infer":
    imgs = jnp.asarray(rng.rand(6, 1, H, W, 3), jnp.float32)
    lidar2img = jnp.tile(jnp.eye(4)[None, None], (1, 6, 1, 1))
    print(f"[uniad-ref] init at {H}x{W} ...", flush=True)
    t0 = time.time()
    # init_state reads setup params, so it only works under apply; boot
    # with a zero-filled dummy of the same structure.
    from sndepth_tpu.models.uniad_track import TrackState
    from sndepth_tpu.models.track_runtime import empty_tracks
    dummy = TrackState(
        prev_bev=jnp.zeros((1, model.bev_h * model.bev_w,
                            model.embed_dims)),
        tracks=empty_tracks(model.num_query, model.embed_dims,
                            model.num_classes, model.mem_len),
        next_obj_id=jnp.zeros((), jnp.int32),
        timestamp=jnp.zeros(()),
        has_prev=jnp.zeros((), bool))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), imgs,
                                    lidar2img, dummy)
    state = model.apply(variables, method="init_state")
    print(f"  init done in {time.time()-t0:.1f}s", flush=True)

    @jax.jit
    def frame(variables, state, imgs):
        new_state, out = model.apply(variables, imgs, lidar2img, state)
        return new_state, sum(jnp.sum(o)
                              for o in jax.tree_util.tree_leaves(out))

    t0 = time.time()
    state, s = frame(variables, state, imgs)
    _ = float(s)
    print(f"  first frame (compile+run): {time.time()-t0:.1f}s", flush=True)
    # Second chained frame separately: the carried state's dtypes must be
    # stable or this recompiles (the r3/r5 recompile bug class) — timing
    # it alone keeps any such regression visible instead of smearing it
    # into the steady mean.
    t0 = time.time()
    state, s = frame(variables, state, imgs + 1e-7)
    _ = float(s)
    print(f"  second frame (chained): {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    n = 5
    for i in range(n):
        state, s = frame(variables, state, imgs + i * 1e-6)
    _ = float(s)
    print(f"  steady: {(time.time()-t0)/n*1e3:.1f} ms/frame at {H}x{W}",
          flush=True)
else:
    from sndepth_tpu.train import uniad as tu
    clip = tu.synthetic_clip(model, t_frames=2, ng=8, img_hw=(H, W))
    print(f"[uniad-ref] train init at {H}x{W} ...", flush=True)
    t0 = time.time()
    state = tu.create_train_state(model, clip, jax.random.PRNGKey(0))
    step = tu.make_train_step(model)
    print(f"  init done in {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    state, m = step(state, clip)
    _ = float(m["loss"])
    print(f"  first step (compile+run): {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    n = 3
    for i in range(n):
        state, m = step(state, clip)
    _ = float(m["loss"])
    print(f"  steady: {(time.time()-t0)/n*1e3:.1f} ms/clip-step "
          f"({H}x{W}, T=2)", flush=True)
