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


def test_residual_color_seeding_picks_the_unexplained_ball():
    """--rescue_seed_color machinery end-to-end on synthetic frames:
    static gray background + a green and a blue moving disk; with the
    healthy slot already colored green, the seed for the reset slot must
    come out blue (the object nobody explains)."""
    H = W = 16
    rs = np.random.RandomState(0)
    bg_true = np.full((H, W, 3), 0.3, np.float32)
    frames = []
    for t in range(40):
        f = bg_true.copy()
        gy, gx = 3 + (t % 7), 3 + (t % 9)        # green disk path
        by, bx = 11 - (t % 6), 11 - (t % 8)      # blue disk path
        f[gy - 1:gy + 2, gx - 1:gx + 2] = [0.1, 0.9, 0.1]
        f[by - 1:by + 2, bx - 1:bx + 2] = [0.1, 0.2, 0.9]
        frames.append(f)
    frames = np.stack(frames)[None]              # [1, T, H, W, C]

    bg = surgery.median_background(frames)
    np.testing.assert_allclose(bg, bg_true, atol=0.02)
    colors = surgery.object_pixel_colors(frames, bg)
    assert colors.shape[0] >= 40 * 9            # both disks, all frames
    clusters = surgery.color_clusters(colors, k=2, seed=0)
    # one cluster ~green, one ~blue
    greens = clusters[:, 1] > clusters[:, 2]
    assert greens.sum() == 1, clusters
    taken = [np.array([0.1, 0.9, 0.1], np.float32)]   # healthy slot: green
    seed = surgery.pick_seed_colors(clusters, taken, 1)[0]
    assert seed[2] > seed[1] > seed[0] - 0.05, seed   # blue-dominant
    # with nothing taken, two seeds cover BOTH clusters
    two = surgery.pick_seed_colors(clusters, [], 2)
    assert {bool(c[1] > c[2]) for c in two} == {True, False}


def test_slot_content_colors_weighted_by_visible_mask():
    n_objs, tmpl, ch = 2, 8, 3
    p = make_params(n_objs, tmpl, ch)
    # slot 0: visible disk colored red; slot 1: fully dead template
    p = surgery.rescue_slot(p, 0, n_objs, tmpl, ch, radius=2.5,
                            content_rgb=(0.9, 0.1, 0.1))
    tt = tmpl * tmpl
    dead = np.full(tt, -6.0, np.float32)
    p = surgery.set_var_net_output(p, "var_net_template", dead,
                                   np.arange(tt, 2 * tt))
    cols = surgery.slot_content_colors(p, n_objs, tmpl, ch)
    np.testing.assert_allclose(cols[0], [0.9, 0.1, 0.1], atol=1e-3)
    np.testing.assert_allclose(cols[1], [0.5, 0.5, 0.5], atol=1e-6)


def test_slot_salience_catches_background_colored_content():
    """The bounce_one1 mode (round 5): slot 1 has the LARGER visible
    mask but paints background-colored content — mask mass ranks it
    healthiest, salience must rank it dead."""
    n_objs, tmpl, ch = 2, 8, 3
    p = make_params(n_objs, tmpl, ch)
    # slot 0: small-ish blue disk; slot 1: bigger disk, black content
    p = surgery.rescue_slot(p, 0, n_objs, tmpl, ch, radius=2.0,
                            content_rgb=(0.0, 0.0, 0.9))
    p = surgery.rescue_slot(p, 1, n_objs, tmpl, ch, radius=3.5,
                            content_rgb=(0.02, 0.02, 0.02))
    bg = np.zeros((16, 16, ch), np.float32)           # black background
    health = surgery.slot_health(p, n_objs, tmpl)
    assert health[1] > health[0]                      # the trap
    sal = surgery.slot_salience(p, n_objs, tmpl, ch, bg)
    assert sal[0] > 0.5 and sal[1] < 0.1, sal
    assert surgery.select_dead_slots(
        health, tmpl_px=tmpl * tmpl, salience=sal) == [1]
    # same templates over a WHITE background: now the dark slot is the
    # salient one and the rule flips
    sal_w = surgery.slot_salience(p, n_objs, tmpl, ch,
                                  np.ones((16, 16, ch), np.float32))
    assert sal_w[1] > 0.5, sal_w


def test_select_dead_slots_salience_modes():
    h = np.array([44.0, 215.0])
    # without salience: partial-discovery rule resets the weak slot
    assert surgery.select_dead_slots(h, tmpl_px=256) == [0]
    # with salience: the content-dead big slot is reset instead
    assert surgery.select_dead_slots(
        h, tmpl_px=256, salience=np.array([0.8, 0.01])) == [1]
    # both content-dead -> both reset
    assert surgery.select_dead_slots(
        h, tmpl_px=256, salience=np.array([0.05, 0.01])) == [0, 1]
    # salient everywhere -> falls through to the partial-discovery rule
    assert surgery.select_dead_slots(
        h, tmpl_px=256, salience=np.array([0.8, 0.9])) == [0]
    # a zero-mask slot scores salience 0 -> dead, as under the old rule
    assert surgery.select_dead_slots(
        np.array([0.0, 215.0]), tmpl_px=256,
        salience=np.array([0.0, 0.9])) == [0]
