"""System facade tests: full stack with BoW database, relocalization,
map save/load, trajectory export."""

import numpy as np
import pytest

from orb_slam2_comment_tpu.models import frame as fr
from orb_slam2_comment_tpu.models.system import System
from orb_slam2_comment_tpu.models.tracking import LOST, OK
from orb_slam2_comment_tpu.utils import synthetic as syn
from orb_slam2_comment_tpu.utils import trajectory as traj
from orb_slam2_comment_tpu.utils.config import SlamConfig

K = syn.DEFAULT_K
B = syn.DEFAULT_BASELINE


def _cfg(**kw):
    kw.setdefault("sensor", "rgbd")
    return SlamConfig(
        fx=K[0], fy=K[1], cx=K[2], cy=K[3],
        bf=K[0] * B,
        n_features=600,
        n_levels=4,
        max_keyframes=48,
        max_points=12288,
        match_th_scale=1.5,
        **kw,
    )


def _drive(system, scene, poses, start_id=0):
    outs = []
    for i, f in enumerate(
        syn.render_sequence(scene, poses, K=K, depth=True, baseline=B)
    ):
        out = system.track_rgbd(f["image"], f["depth"], f["timestamp"])
        outs.append((out, f["Tcw_gt"]))
    return outs


class TestSystemRGBD:
    def test_full_stack(self, tmp_path):
        cfg = _cfg()
        system = System(cfg)
        scene = syn.make_scene(n_points=1400, seed=0)
        poses = syn.make_trajectory("jitter", n_frames=10, step=0.05)
        outs = _drive(system, scene, poses)
        states = [o.state for o, _ in outs]
        assert states[-1] == OK
        assert system.get_tracking_state() == OK
        assert len(system.get_tracked_map_points()) > 50
        # vocabulary was bootstrapped and the db indexed the KFs
        assert system.voc is not None
        assert system.db is not None
        assert int(np.asarray(system.db.valid).sum()) == system.tracker.n_kfs
        # trajectory export through the Tcr*T_ref chain
        p = tmp_path / "traj.txt"
        system.save_trajectory_tum(str(p))
        lines = p.read_text().strip().split("\n")
        assert len(lines) >= 9
        pk = tmp_path / "kf.txt"
        system.save_keyframe_trajectory_tum(str(pk))
        assert len(pk.read_text().strip().split("\n")) == system.tracker.n_kfs
        # ATE stays centimeter-class
        est = [o.Tcw for o, _ in outs if o.Tcw is not None]
        gt = [g for o, g in outs if o.Tcw is not None]
        assert traj.ate_rmse(est, gt) < 0.03

    def test_map_save_load(self, tmp_path):
        cfg = _cfg()
        system = System(cfg)
        scene = syn.make_scene(n_points=1400, seed=0)
        poses = syn.make_trajectory("jitter", n_frames=6, step=0.05)
        _drive(system, scene, poses)
        n_kfs, n_pts = system.tracker.n_kfs, system.tracker.n_pts
        p = str(tmp_path / "map.npz")
        system.save_map(p)
        system2 = System(cfg, vocabulary=system.voc)
        system2.load_map(p)
        assert system2.tracker.n_kfs == n_kfs
        assert system2.tracker.n_pts == n_pts
        np.testing.assert_array_equal(
            np.asarray(system2.tracker.map.pt_valid),
            np.asarray(system.tracker.map.pt_valid),
        )

    def test_relocalization_recovers_lost_tracking(self):
        cfg = _cfg()
        system = System(cfg)
        scene = syn.make_scene(n_points=1400, seed=0)
        poses = syn.make_trajectory("jitter", n_frames=8, step=0.05)
        outs = _drive(system, scene, poses)
        assert outs[-1][0].state == OK
        # simulate tracking loss: break the motion model and mark LOST
        system.tracker.state = LOST
        system.tracker.velocity = None
        # feed a frame from a previously-seen viewpoint
        f = next(iter(syn.render_sequence(scene, poses[3:4], K=K, depth=True)))
        out = system.track_rgbd(f["image"], f["depth"], 99.0)
        assert out.state == OK, "relocalization failed"
        # recovered pose close to ground truth
        err = np.linalg.norm(out.Tcw[:3, 3] - f["Tcw_gt"][:3, 3])
        assert err < 0.1, err

    def test_localization_only_mode(self):
        cfg = _cfg()
        system = System(cfg)
        scene = syn.make_scene(n_points=1400, seed=0)
        poses = syn.make_trajectory("jitter", n_frames=6, step=0.05)
        _drive(system, scene, poses)
        n_kfs = system.tracker.n_kfs
        system.activate_localization_mode()
        more = syn.make_trajectory("jitter", n_frames=4, step=0.05, seed=5)
        _drive(system, scene, more)
        assert system.tracker.n_kfs == n_kfs  # no new KFs in loc-only mode

    def test_localization_only_vo_mode(self):
        """mbVO branch (Tracking.cc:333-391): when the camera leaves the
        mapped region in localization-only mode, tracking continues as
        visual odometry against the previous frame's depth points."""
        import jax.numpy as jnp

        cfg = _cfg()
        system = System(cfg)
        scene = syn.make_scene(n_points=1400, seed=0)
        poses = syn.make_trajectory("jitter", n_frames=6, step=0.05)
        outs = _drive(system, scene, poses)
        assert outs[-1][0].state == OK
        system.activate_localization_mode()
        # simulate leaving the mapped area: no map point is matchable
        # (so map tracking AND relocalization both fail), but the scene
        # still renders — odometry must carry the pose
        t = system.tracker
        t.map = t.map._replace(pt_valid=jnp.zeros_like(t.map.pt_valid))
        more = syn.make_trajectory("forward", n_frames=6, step=0.08)
        outs2 = _drive(system, scene, more)
        errs = []
        for out, gt in outs2[1:]:
            assert out.state == OK, "VO mode lost tracking"
            errs.append(np.linalg.norm(out.Tcw[:3, 3] - gt[:3, 3]))
        assert system.tracker.vo, "VO flag not raised"
        assert max(errs) < 0.08, f"VO drift too large: {errs}"

    def test_auto_reset_after_early_loss(self):
        """Lost with <=5 KFs soon after init -> full reset + fresh map on
        the next frame (Tracking::Track, src/Tracking.cc:472-480)."""
        import jax.numpy as jnp

        cfg = _cfg()
        system = System(cfg)
        scene = syn.make_scene(n_points=1400, seed=0)
        poses = syn.make_trajectory("jitter", n_frames=3, step=0.05)
        outs = _drive(system, scene, poses)
        assert outs[-1][0].state == OK
        assert 0 < system.tracker.n_kfs <= 5
        # force loss: make every map point unmatchable
        t = system.tracker
        t._flush_all()
        t.map = t.map._replace(pt_valid=jnp.zeros_like(t.map.pt_valid))
        more = syn.make_trajectory("jitter", n_frames=6, step=0.05, seed=7)
        # read each state as a real driver does — resolution of the async
        # pipeline is what surfaces LOST to the auto-reset check
        states = []
        for f in syn.render_sequence(
            scene, more, K=K, depth=True, baseline=B
        ):
            out = system.track_rgbd(f["image"], f["depth"], f["timestamp"])
            states.append(out.state)
        # the LOST frame triggers a reset; re-initialization follows and
        # tracking must be OK again on a fresh map
        assert LOST in states
        assert states[-1] == OK, f"did not recover via auto-reset: {states}"
        assert system.tracker.n_kfs >= 1
        assert int(jnp.sum(system.tracker.map.pt_valid)) > 0
