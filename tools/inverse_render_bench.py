"""On-chip inverse-rendering benchmark -> docs/inverse_render_tpu_rNN.json.

Round 3 measured 0.244 s/step at 64x64x16 — ~2x the jit-path bound
(docs/grad_bench_r03.jsonl: 0.088-0.118) — because the loop re-taped
eagerly on the host (build_tables + 8 uploads through the ~28 ms tunnel
per step). Round 4's fit runs the WHOLE optimization as one lax.scan
inside one jit (traced table rebuild -> tape kernel -> replay
value_and_grad -> Adam update), so the only host traffic is one dispatch
for all steps. This tool times the jitted scan itself: warm-up call
compiles, the timed call is a cache hit (pure device execution + one
dispatch round-trip, amortized over the steps).

Usage: python tools/inverse_render_bench.py [--steps 80] [--out PATH]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from raytracingweekend_tpu.models.scenes import make_scene
from raytracingweekend_tpu.ops import mega_grad as mg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="cornell_box")
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--ny", type=int, default=64)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--max-depth", type=int, default=8)
    ap.add_argument("--T", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--lr", type=float, default=0.08)
    ap.add_argument("--out", default="docs/inverse_render_tpu_r04.json")
    args = ap.parse_args()
    import optax

    scene = make_scene(args.scene, args.nx / args.ny)
    key = jax.random.key(0)
    interpret = jax.default_backend() in ("cpu", "gpu")

    # target: tape render at the TRUE params (same estimator the fit uses)
    ctx = mg.plan_tape(scene, args.nx, args.ny, args.spp,
                       max_depth=args.max_depth, T=args.T)
    target, _, _ = mg.tape_forward(key, ctx, interpret=interpret)
    target = jnp.asarray(target)
    print("target mean", float(jnp.sum(target)) / target.size, flush=True)

    true_color = np.asarray(scene.textures.color[1]).tolist()
    bad = scene.replace(textures=scene.textures.replace(
        color=scene.textures.color.at[1].set(
            jnp.asarray([0.2, 0.2, 0.2]))))

    set_params = lambda sc, p: sc.replace(
        textures=sc.textures.replace(color=p))
    replay = mg.make_replay(ctx)
    cfg, n_tiles, pixf, meta = (ctx["cfg"], ctx["n_tiles"], ctx["pixf"],
                                ctx["meta"])
    seed = jax.random.randint(key, (1, 1), 0, np.int32(2 ** 31 - 1),
                              dtype=jnp.int32)
    opt = optax.adam(args.lr)

    def one_step(carry, _):
        params, opt_state = carry
        tabs8 = jax.tree_util.tree_map(
            lax.stop_gradient,
            mg.build_tables_traced(set_params(bad, params), bad, meta))
        tape = mg._tape_launch(tabs8, pixf, seed, cfg, n_tiles, interpret)

        def loss_fn(p):
            img = replay(set_params(bad, p), tape, seed)
            return jnp.mean((img - target) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        params = jnp.clip(params, 0.0, None)
        return (params, opt_state), loss

    @jax.jit
    def run(p0, s0):
        return lax.scan(one_step, (p0, s0), None, length=args.steps)

    params0 = bad.textures.color
    s0 = opt.init(params0)
    # compile + warm
    t0 = time.perf_counter()
    (p_w, _), losses_w = run(params0, s0)
    _sync = float(jnp.sum(losses_w))
    t_compile = time.perf_counter() - t0
    print(f"compile+first run: {t_compile:.1f}s", flush=True)
    # timed: jit cache hit, one dispatch for the whole scan
    t0 = time.perf_counter()
    (params, _), losses = run(params0, s0)
    _sync = float(jnp.sum(losses))
    dt = time.perf_counter() - t0
    losses = np.asarray(losses)
    rec = np.asarray(set_params(bad, params).textures.color[1])
    out = {
        "scene": args.scene, "nx": args.nx, "ny": args.ny,
        "spp": args.spp, "steps": args.steps,
        "seconds_total": round(dt, 3),
        "s_per_step": round(dt / args.steps, 4),
        "loss_first": float(losses[0]), "loss_final": float(losses[-1]),
        "true_color": true_color,
        "recovered": [round(float(v), 4) for v in rec],
        "note": ("wall-color recovery by Adam descent THROUGH the "
                 "megakernel, entirely on-chip: the whole fit is ONE "
                 "jitted lax.scan (traced table rebuild -> tape kernel "
                 "-> replay value_and_grad -> update per step); round "
                 "3's 0.244 s/step eager re-taping overhead is gone"),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
