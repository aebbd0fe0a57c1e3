"""Capture a JAX profiler trace of the flagship train/generate steps
(TPU perf workflow; view with xprof/tensorboard).

Usage: python scripts/profile.py [trace_dir] [train|generate]
"""

import sys

from _common import compose


def main() -> None:
    args = [a for a in sys.argv[1:] if "=" not in a]
    trace_dir = args[0] if args else "/tmp/p3tpu_trace"
    mode = args[1] if len(args) > 1 else "generate"
    overrides = [a for a in sys.argv[1:] if "=" in a]

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pixelspointspolygons_tpu.models.pix2poly import (
        Tokenizer,
        build_pix2poly,
        greedy_generate,
    )

    cfg = compose(["experiment=p2p_image", "run_type=debug"] + overrides)
    tok = Tokenizer(cfg)
    model = build_pix2poly(cfg, tok)
    B = 8
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(B, 224, 224, 3).astype(np.float32))
    y = jnp.full((B, tok.max_len), tok.PAD_code, jnp.int32).at[:, 0].set(tok.BOS_code)
    variables = model.init(jax.random.PRNGKey(0), {"images": images[:2]}, y[:2, :-1])

    if mode == "generate":
        fn = jax.jit(
            lambda v, b: greedy_generate(
                model, v, b, bos_code=tok.BOS_code, generation_steps=tok.max_len - 1
            )
        )
        run = lambda: np.asarray(fn(variables, {"images": images})[0])
    else:
        from pixelspointspolygons_tpu.train import make_train_step, make_optimizer, create_train_state
        import optax

        tx = make_optimizer("adamw", optax.constant_schedule(3e-4), weight_decay=1e-4, b2=0.95)
        state = create_train_state(model, variables, tx)
        step = make_train_step(model, 1.0, 10.0, tok.PAD_code)
        batch = {
            "images": images,
            "y": y,
            "y_perm": jnp.asarray(np.eye(tok.max_num_vertices, dtype=np.float32)[None].repeat(B, 0)),
        }
        key = jax.random.PRNGKey(0)

        def run():
            nonlocal state
            state, m = step(state, batch, key)
            return np.asarray(m["loss"])

    run()  # compile
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            run()
    print(f"trace written to {trace_dir} (mode={mode})")


if __name__ == "__main__":
    main()
