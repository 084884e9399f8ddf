"""The torch loss bridge: gradients must equal jax.grad through the full
pipeline, scale with upstream gradients, and drive a torch optimiser."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from fovvideovdp_tpu import fvvdp  # noqa: E402
from fovvideovdp_tpu.torch_interop import fvvdp_torch_loss  # noqa: E402


@pytest.fixture(scope="module")
def pair():
    rng = np.random.RandomState(5)
    ref = rng.rand(40, 56, 3).astype(np.float32)
    tst = np.clip(ref + rng.randn(*ref.shape) * 0.05, 0, 1).astype(np.float32)
    return tst, ref


def test_torch_grad_equals_jax_grad(pair):
    tst, ref = pair
    fv = fvvdp(display_name="standard_4k")
    loss_fn = fvvdp_torch_loss(fv, dim_order="HWC")

    t_t = torch.tensor(tst, requires_grad=True)
    t_r = torch.tensor(ref)
    loss = loss_fn(t_t, t_r)
    loss.backward()

    g_jax = jax.grad(lambda t: 10.0 - fv.predict_traced(t, ref,
                                                        dim_order="HWC"))(tst)
    np.testing.assert_allclose(np.asarray(loss.detach()),
                               10.0 - fv.predict_traced(tst, ref,
                                                        dim_order="HWC"),
                               rtol=1e-5)
    # jitted (bridge) vs unjitted grad programs fuse differently; tiny fp
    # reassociation drift (measured max 7e-6 absolute) is expected
    np.testing.assert_allclose(t_t.grad.numpy(), np.asarray(g_jax),
                               rtol=2e-2, atol=1e-5)


def test_torch_upstream_grad_scaling_and_ref(pair):
    tst, ref = pair
    fv = fvvdp(display_name="standard_4k")
    loss_fn = fvvdp_torch_loss(fv, dim_order="HWC", grad_ref=True)

    t_t = torch.tensor(tst, requires_grad=True)
    t_r = torch.tensor(ref, requires_grad=True)
    (3.0 * loss_fn(t_t, t_r)).backward()
    g1 = t_t.grad.clone()
    assert t_r.grad is not None and float(t_r.grad.abs().sum()) > 0

    t_t2 = torch.tensor(tst, requires_grad=True)
    loss_fn2 = fvvdp_torch_loss(fv, dim_order="HWC")
    loss_fn2(t_t2, torch.tensor(ref)).backward()
    # the two bridges compile different argnums programs; fp drift only
    np.testing.assert_allclose(g1.numpy(), 3.0 * t_t2.grad.numpy(),
                               rtol=2e-2, atol=1e-5)


def test_torch_optimiser_reduces_loss(pair):
    tst, ref = pair
    fv = fvvdp(display_name="standard_4k")
    loss_fn = fvvdp_torch_loss(fv, dim_order="HWC")

    x = torch.tensor(tst, requires_grad=True)
    opt = torch.optim.Adam([x], lr=5e-3)
    losses = []
    for _ in range(6):
        opt.zero_grad()
        loss = loss_fn(x, torch.tensor(ref))
        loss.backward()
        opt.step()
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_eval_path_under_no_grad(pair):
    tst, ref = pair
    fv = fvvdp(display_name="standard_4k")
    loss_fn = fvvdp_torch_loss(fv, dim_order="HWC")
    t_t = torch.tensor(tst, requires_grad=True)
    t_r = torch.tensor(ref)
    with torch.no_grad():
        v_eval = loss_fn(t_t, t_r)
    assert t_t.grad is None
    v_train = loss_fn(t_t, t_r)
    np.testing.assert_allclose(float(v_eval), float(v_train.detach()),
                               rtol=1e-5)
