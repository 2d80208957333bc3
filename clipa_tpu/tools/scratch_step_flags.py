"""Time the bench train step under XLA flag variants + dispatch structures.

Run in a fresh subprocess per flag set (XLA_FLAGS is read at backend init):
    python -m clipa_tpu.tools.scratch_step_flags            # time step
    python -m clipa_tpu.tools.scratch_step_flags --double   # 2 steps/dispatch
"""
import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--double", action="store_true")
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import bench
    update, state, gbatch = bench.build_step(
        "bfloat16", args.batch, mu_dtype="bfloat16",
        optax_name="scale_by_fused_adam", res=112, tokens=8, variant="L/16",
        mask_ratio=0.0)

    if args.double:
        import functools

        @functools.partial(jax.jit, donate_argnums=(0,))
        def update2(state, batch):
            state, _ = update(state, batch)
            return update(state, batch)
        steps_per_call = 2
        call = update2
    else:
        steps_per_call = 1
        call = update

    for _ in range(3):
        state, meas = call(state, gbatch)
    float(meas["training_loss"])
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, meas = call(state, gbatch)
    float(meas["training_loss"])
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / (args.iters * steps_per_call)
    print(f"RESULT step_ms={dt*1e3:.2f} batch={args.batch} "
          f"steps_per_call={steps_per_call}")


if __name__ == "__main__":
    main()
