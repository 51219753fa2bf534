"""Optimizer parity: run the same 300-step regression fit the reference uses
(optimizer.py:100-126) and compare trajectories against the reference
optimizers step by step."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from cleantransformer_tpu.optim import sgd, adamw, adamw_decoupled


def _make_problem(seed=999, steps=50):
    # float64 on both sides: optimization trajectories amplify fp32 rounding
    # chaotically over 50 steps, so parity is asserted in double precision.
    torch.manual_seed(seed)
    gt_weight = torch.rand(3, 4).double()
    gt_bias = torch.rand(4).double()
    w0, b0 = torch.rand(3, 4).double(), torch.rand(4).double()
    inputs = [torch.rand(2, 3).double() for _ in range(steps)]
    return gt_weight, gt_bias, w0, b0, inputs


def _run_reference(opt_name, steps=50):
    from CleanTransformer.optimizer import SGD as RefSGD, AdamW as RefAdamW
    gt_w, gt_b, w0, b0, inputs = _make_problem(steps=steps)
    w = w0.clone().requires_grad_(True)
    b = b0.clone().requires_grad_(True)
    if opt_name == "sgd":
        opt = RefSGD([w, b], lr=0.01, weight_decay=0.01, momentum=0.9)
    else:
        opt = RefAdamW([w, b], lr=0.01, weight_decay=0.01)
    for inp in inputs:
        gt = inp @ gt_w + gt_b
        pred = inp @ w + b
        loss = torch.sum((gt - pred).reshape(-1) ** 2)
        loss.backward()
        opt.step()
        opt.zero_grad()
    return w.detach().numpy(), b.detach().numpy()


import contextlib


@contextlib.contextmanager
def enable_x64():
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", False)


def _run_ours(factory, steps=50):
    with enable_x64():
        gt_w, gt_b, w0, b0, inputs = _make_problem(steps=steps)
        params = {"w": jnp.asarray(w0.numpy()), "b": jnp.asarray(b0.numpy())}
        gt_w, gt_b = jnp.asarray(gt_w.numpy()), jnp.asarray(gt_b.numpy())
        init_fn, update_fn = factory
        state = init_fn(params)

        def loss_fn(p, inp):
            gt = inp @ gt_w + gt_b
            pred = inp @ p["w"] + p["b"]
            return jnp.sum((gt - pred).reshape(-1) ** 2)

        step = jax.jit(lambda p, s, inp: update_fn(jax.grad(loss_fn)(p, inp), s, p))
        for inp in inputs:
            params, state = step(params, state, jnp.asarray(inp.numpy()))
        return np.asarray(params["w"]), np.asarray(params["b"])


def test_sgd_matches_reference():
    ref_w, ref_b = _run_reference("sgd")
    got_w, got_b = _run_ours(sgd(lr=0.01, weight_decay=0.01, momentum=0.9))
    np.testing.assert_allclose(got_w, ref_w, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(got_b, ref_b, rtol=1e-7, atol=1e-9)


def test_adamw_matches_reference():
    ref_w, ref_b = _run_reference("adamw")
    got_w, got_b = _run_ours(adamw(lr=0.01, weight_decay=0.01))
    np.testing.assert_allclose(got_w, ref_w, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(got_b, ref_b, rtol=1e-7, atol=1e-9)


def test_adamw_decoupled_matches_torch():
    gt_w, gt_b, w0, b0, inputs = _make_problem()
    w = w0.clone().requires_grad_(True)
    b = b0.clone().requires_grad_(True)
    opt = torch.optim.AdamW([w, b], lr=0.01, weight_decay=0.01)
    for inp in inputs:
        loss = torch.sum((inp @ gt_w + gt_b - (inp @ w + b)).reshape(-1) ** 2)
        loss.backward()
        opt.step()
        opt.zero_grad()
    got_w, got_b = _run_ours(adamw_decoupled(lr=0.01, weight_decay=0.01))
    np.testing.assert_allclose(got_w, w.detach().numpy(), rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(got_b, b.detach().numpy(), rtol=1e-7, atol=1e-9)


def test_adamw_decoupled_mask_excludes_leaves():
    params = {"w": jnp.ones((2, 2)), "ln_w": jnp.ones((2,))}
    grads = {"w": jnp.zeros((2, 2)), "ln_w": jnp.zeros((2,))}
    init_fn, update_fn = adamw_decoupled(lr=0.1, weight_decay=1.0,
                                         mask={"w": True, "ln_w": False})
    state = init_fn(params)
    new_params, _ = update_fn(grads, state, params)
    assert np.all(np.asarray(new_params["ln_w"]) == 1.0)  # no decay applied
    assert np.all(np.asarray(new_params["w"]) < 1.0)      # decay applied


def test_adamw_fp32_moments_on_bf16_params_tracks_fp32_master():
    """moment_dtype=float32 with bf16 params (the 1.1B-on-one-chip recipe,
    optim.py): moments and update math run in fp32 and only the final
    parameter cast is bf16, so the trajectory must track the fp32-master
    run within bf16 resolution; moments must actually BE fp32."""
    rs = np.random.RandomState(0)
    w0 = rs.randn(16, 8).astype(np.float32)
    gs = [rs.randn(16, 8).astype(np.float32) * 0.1 for _ in range(20)]

    def run(params, moment_dtype):
        init_fn, update_fn = adamw_decoupled(lr=0.01, weight_decay=0.01,
                                             moment_dtype=moment_dtype)
        state = init_fn(params)
        for g in gs:
            params, state = update_fn(
                jax.tree_util.tree_map(lambda _: jnp.asarray(g, _.dtype),
                                       params), state, params)
        return params, state

    ref, _ = run({"w": jnp.asarray(w0)}, None)                # fp32 master
    got, st = run({"w": jnp.asarray(w0, jnp.bfloat16)}, jnp.float32)
    assert got["w"].dtype == jnp.bfloat16
    assert st.mu["w"].dtype == jnp.float32
    assert st.nu["w"].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got["w"], np.float32),
                               np.asarray(ref["w"]), rtol=0.02, atol=0.02)
