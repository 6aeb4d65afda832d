"""Checkpoint-surgery unit tests (train/surgery.py): exact final-bias
installation, slot-health ranking, and --template_init prior accounting
(the prior is a graph constant on top of the template MLP — surgery must
judge and install EFFECTIVE logits, not MLP-only output)."""
import numpy as np

from paig_reproduction_tpu.train import surgery


def _vn(rs, n_out, hidden=16):
    return {
        "TorchDense_0": {
            "kernel": (rs.randn(10, hidden) * 0.3).astype(np.float32),
            "bias": (rs.randn(hidden) * 0.1).astype(np.float32)},
        "TorchDense_1": {
            "kernel": (rs.randn(hidden, n_out) * 0.3).astype(np.float32),
            "bias": (rs.randn(n_out) * 0.1).astype(np.float32)},
    }


def make_params(n_objs=2, tmpl=8, ch=3, seed=0):
    rs = np.random.RandomState(seed)
    tt = tmpl * tmpl
    return {
        "var_net_template": _vn(rs, n_objs * tt),
        "var_net_content": _vn(rs, n_objs * tt * ch),
        "var_net_background": _vn(rs, tt * ch),
    }


def test_set_var_net_output_exact():
    p = make_params()
    target = np.linspace(-2.0, 2.0, 2 * 8 * 8).astype(np.float32)
    p2 = surgery.set_var_net_output(p, "var_net_template", target)
    np.testing.assert_allclose(
        surgery.var_net_forward(p2, "var_net_template"), target, atol=1e-5)
    # untouched nets unchanged
    np.testing.assert_array_equal(
        surgery.var_net_forward(p2, "var_net_content"),
        surgery.var_net_forward(p, "var_net_content"))


def test_slot_health_accounts_for_template_init_prior():
    n_objs, tmpl = 2, 8
    p = make_params(n_objs, tmpl)
    # MLP outputs pinned to 0: without the prior every slot reads dead,
    # but a checkpoint trained with --template_init carries its mask mass
    # in the +6-disk graph constant.
    p = surgery.set_var_net_output(
        p, "var_net_template", np.zeros(n_objs * tmpl * tmpl, np.float32))
    assert (surgery.slot_health(p, n_objs, tmpl) == 0).all()
    h = surgery.slot_health(p, n_objs, tmpl, template_init=3.0)
    assert (h > 0).all()


def test_rescue_slot_installs_effective_disk_under_prior():
    n_objs, tmpl, ch, ti = 2, 8, 3, 3.0
    p = make_params(n_objs, tmpl, ch)
    p = surgery.rescue_slot(p, 1, n_objs, tmpl, ch, radius=2.5,
                            template_init=ti)
    eff = (surgery.var_net_forward(p, "var_net_template")
           .reshape(n_objs, tmpl, tmpl)
           + surgery.template_prior_logits(tmpl, ti)[None])
    np.testing.assert_allclose(
        eff[1], surgery.disk_template_logits(tmpl, 2.5), atol=1e-4)
    # rescued slot reads healthy under the same prior
    assert surgery.slot_health(p, n_objs, tmpl, template_init=ti)[1] > 0


def test_select_dead_slots_policy():
    # one starved slot -> just that slot
    assert surgery.select_dead_slots(np.array([50.0, 3.0])) == [1]
    # no tmpl_px: degrades to the historical stalled -> reset-all
    assert surgery.select_dead_slots(np.array([40.0, 55.0])) == [0, 1]
    # all-zero health (fully dead) -> all slots
    assert surgery.select_dead_slots(np.zeros(3)) == [0, 1, 2]
    # with tmpl_px: every slot ballooned (>50% of the template visible)
    # -> reset all (the 3bp failure; also spring_one4's [155, 229]/256)
    assert surgery.select_dead_slots(
        np.array([155.0, 229.0]), tmpl_px=256) == [0, 1]
    # with tmpl_px: partial discovery (no dead, not all ballooned) ->
    # only the least healthy slot
    assert surgery.select_dead_slots(
        np.array([60.0, 120.0]), tmpl_px=256) == [0]
    # dead-slot rule still wins over the balloon check
    assert surgery.select_dead_slots(
        np.array([250.0, 10.0]), tmpl_px=256) == [1]
