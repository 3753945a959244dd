"""Local mapping stage tests: culling, triangulation, fusion, local BA."""

import jax.numpy as jnp
import numpy as np

from orb_slam2_comment_tpu.models import frame as fr
from orb_slam2_comment_tpu.models import local_mapping as lm
from orb_slam2_comment_tpu.models import map_state as ms
from orb_slam2_comment_tpu.models.tracking import OK, Tracker
from orb_slam2_comment_tpu.utils import synthetic as syn
from orb_slam2_comment_tpu.utils import trajectory as traj
from orb_slam2_comment_tpu.utils.config import SlamConfig

K = syn.DEFAULT_K
B = syn.DEFAULT_BASELINE


def _cfg(**kw):
    return SlamConfig(
        sensor="rgbd",
        fx=K[0], fy=K[1], cx=K[2], cy=K[3],
        bf=K[0] * B,
        n_features=600,
        n_levels=4,
        max_keyframes=32,
        max_points=8192,
        match_th_scale=1.5,
        **kw,
    )


def _run_with_mapper(n_frames=10):
    cfg = _cfg(enable_local_ba=True)
    scene = syn.make_scene(n_points=1400, seed=0)
    poses = syn.make_trajectory("jitter", n_frames=n_frames, step=0.05)
    tracker = Tracker(cfg)
    mapper = lm.LocalMapper(cfg, tracker)
    tracker.new_kf_callbacks.append(mapper.process)
    est, gt = [], []
    for i, f in enumerate(
        syn.render_sequence(scene, poses, K=K, depth=True, baseline=B)
    ):
        frame = fr.build_frame_rgbd(i, f["timestamp"], f["image"], f["depth"], cfg)
        out = tracker.track(frame)
        if out.Tcw is not None:
            est.append(out.Tcw)
            gt.append(f["Tcw_gt"])
    return tracker, est, gt


class TestFullLocalMapping:
    def test_pipeline_with_ba(self):
        tracker, est, gt = _run_with_mapper()
        assert len(est) == 10
        assert tracker.state == OK
        ate = traj.ate_rmse(est, gt)
        assert ate < 0.03, f"ATE {ate*100:.1f} cm"
        # local mapping should keep a healthy observation graph
        obs = np.asarray(ms.point_observation_counts(tracker.map))
        valid = np.asarray(tracker.map.pt_valid)
        assert (obs[valid] >= 1).all()
        assert (obs[valid] >= 2).sum() > 100  # multi-view points exist


class TestKeyFrameCulling:
    def test_redundant_kf_culled_and_tree_reparented(self):
        """LocalMapping::KeyFrameCulling (src/LocalMapping.cc:632-758): with
        5 KFs observing the same close stereo points at octave 0, the
        middle KFs are redundant until the per-point observer count falls
        below 3; the spanning tree re-parents through culled nodes and
        kf_Tcp reconstructs the culled pose."""
        cfg = _cfg()
        m = ms.empty_map(8, 64, 64)
        npt = 60
        poses = []
        kf_pose = m.kf_pose
        for i in range(5):
            T = np.eye(4)
            T[0, 3] = 0.1 * i
            poses.append(T)
            kf_pose = kf_pose.at[i].set(jnp.asarray(T))
        obs = m.kf_obs
        for i in range(5):
            obs = obs.at[i, :npt].set(jnp.arange(npt))
        m = m._replace(
            kf_pose=kf_pose,
            kf_valid=m.kf_valid.at[:5].set(True),
            kf_obs=obs,
            kf_feat_valid=m.kf_feat_valid.at[:5, :npt].set(True),
            kf_depth=m.kf_depth.at[:5, :npt].set(2.0),   # close (< thDepth)
            kf_uright=m.kf_uright.at[:5, :npt].set(10.0),
            kf_parent=m.kf_parent.at[1].set(0).at[2].set(1)
                                 .at[3].set(2).at[4].set(3),
            pt_valid=m.pt_valid.at[:npt].set(True),
        )
        m2 = lm.cull_keyframes(m, jnp.asarray(4, jnp.int32), cfg)
        valid = np.asarray(m2.kf_valid)
        assert valid[0] and valid[4]          # origin + current survive
        assert not valid[1] and not valid[2]  # redundant -> culled
        assert valid[3]                       # observers fell below 3
        # surviving KF 3 re-parented off the dead chain to a live ancestor
        assert valid[int(m2.kf_parent[3])]
        # the trajectory-saver walk (System.cc:350-360) reconstructs every
        # culled KF's pose exactly: compose frozen Tcp factors up the tree
        # to the first live ancestor (poses unchanged since cull here)
        parent = np.asarray(m2.kf_parent)
        Tcp = np.asarray(m2.kf_Tcp)
        pose = np.asarray(m2.kf_pose)
        for c in (1, 2):
            T = np.eye(4)
            r = c
            while r >= 0 and not valid[r]:
                T = T @ Tcp[r]
                r = parent[r]
            assert r >= 0
            np.testing.assert_allclose(T @ pose[r], poses[c], atol=1e-5)

    def test_dead_child_keeps_frozen_parent(self):
        """Regression (round-3 desk 0.29m ATE bursts): a KF culled EARLIER
        whose frozen parent is culled NOW must NOT be re-parented — its
        frozen Tcp was computed against that parent, and re-pointing it
        skips the parent's Tcp factor in the trajectory-saver walk. The
        reference freezes (mTcp, mpParent) forever at SetBadFlag
        (src/KeyFrame.cc:453-546)."""
        cfg = _cfg()
        m = ms.empty_map(8, 64, 64)
        npt = 60
        nkf = 6
        poses = []
        kf_pose = m.kf_pose
        for i in range(nkf):
            T = np.eye(4)
            # rotations matter: a skipped Tcp factor with rotation produces
            # large position error via the lever arm
            th = 0.2 * i
            T[:3, :3] = np.array([[np.cos(th), 0, np.sin(th)],
                                  [0, 1, 0],
                                  [-np.sin(th), 0, np.cos(th)]])
            T[0, 3] = 0.3 * i
            poses.append(T)
            kf_pose = kf_pose.at[i].set(jnp.asarray(T))
        obs = m.kf_obs
        for i in range(nkf):
            obs = obs.at[i, :npt].set(jnp.arange(npt))
        # KF 3 is ALREADY dead, frozen against parent 2 (Tcp precomputed)
        Tcp3 = poses[3] @ np.linalg.inv(poses[2])
        m = m._replace(
            kf_pose=kf_pose,
            kf_valid=m.kf_valid.at[:nkf].set(True).at[3].set(False),
            kf_obs=obs,
            kf_feat_valid=m.kf_feat_valid.at[:nkf, :npt].set(True),
            kf_depth=m.kf_depth.at[:nkf, :npt].set(2.0),
            kf_uright=m.kf_uright.at[:nkf, :npt].set(10.0),
            kf_parent=m.kf_parent.at[1].set(0).at[2].set(1)
                                 .at[3].set(2).at[4].set(2).at[5].set(4),
            kf_Tcp=m.kf_Tcp.at[3].set(jnp.asarray(Tcp3)),
            pt_valid=m.pt_valid.at[:npt].set(True),
        )
        m2 = lm.cull_keyframes(m, jnp.asarray(5, jnp.int32), cfg)
        valid = np.asarray(m2.kf_valid)
        assert not valid[2], "KF2 should be culled by redundancy"
        # the dead child keeps its frozen parent and Tcp
        assert int(m2.kf_parent[3]) == 2
        np.testing.assert_allclose(np.asarray(m2.kf_Tcp[3]), Tcp3, atol=1e-6)
        # and the saver walk still reconstructs KF3's pose exactly
        parent = np.asarray(m2.kf_parent)
        Tcp = np.asarray(m2.kf_Tcp)
        pose = np.asarray(m2.kf_pose)
        T = np.eye(4)
        r = 3
        while r >= 0 and not valid[r]:
            T = T @ Tcp[r]
            r = parent[r]
        assert r >= 0
        np.testing.assert_allclose(T @ pose[r], poses[3], atol=1e-5)


class TestCulling:
    def test_low_found_ratio_culled(self):
        cfg = _cfg()
        m = ms.empty_map(8, 64, 16)
        # one valid KF observing point 0; point 1 unobserved & weak
        m = m._replace(
            kf_valid=m.kf_valid.at[0].set(True),
            pt_valid=m.pt_valid.at[jnp.asarray([0, 1])].set(True),
            pt_first_kf=m.pt_first_kf.at[jnp.asarray([0, 1])].set(0),
            pt_visible=m.pt_visible.at[jnp.asarray([0, 1])].set(10),
            pt_found=m.pt_found.at[0].set(9).at[1].set(1),  # ratio .9 vs .1
            kf_obs=m.kf_obs.at[0, 0].set(0).at[0, 1].set(1),
            kf_uright=m.kf_uright.at[0, 0].set(5.0).at[0, 1].set(5.0),
        )
        m2 = lm.cull_points(m, jnp.asarray(1, jnp.int32))
        assert bool(m2.pt_valid[0])
        assert not bool(m2.pt_valid[1])  # found ratio 0.1 < 0.25
        assert int(m2.kf_obs[0, 1]) == -1  # observation dropped


class TestTriangulation:
    def test_creates_correct_points(self):
        """Two rendered keyframes with known poses: triangulated points
        should land near scene landmarks."""
        cfg = _cfg()
        scene = syn.make_scene(n_points=400, seed=7)
        T1 = np.eye(4, dtype=np.float32)
        T2 = np.eye(4, dtype=np.float32)
        T2[:3, 3] = [0.4, 0.0, 0.0]  # wide baseline
        img1 = syn.render(scene, T1, K, syn.DEFAULT_HW, seed=1)
        img2 = syn.render(scene, T2, K, syn.DEFAULT_HW, seed=2)
        f1 = fr.build_frame_mono(0, 0.0, img1, cfg)
        f2 = fr.build_frame_mono(1, 0.05, img2, cfg)
        m = ms.empty_map(8, 2048, f1.n_feat)
        nf = f1.n_feat

        def insert(m, slot, f, T):
            return m._replace(
                kf_pose=m.kf_pose.at[slot].set(jnp.asarray(T)),
                kf_valid=m.kf_valid.at[slot].set(True),
                kf_xy=m.kf_xy.at[slot].set(f.feats.xy),
                kf_octave=m.kf_octave.at[slot].set(f.feats.octave),
                kf_angle=m.kf_angle.at[slot].set(f.feats.angle),
                kf_desc=m.kf_desc.at[slot].set(f.feats.desc),
                kf_feat_valid=m.kf_feat_valid.at[slot].set(f.feats.valid),
            )

        m = insert(m, 0, f1, T1)
        m = insert(m, 1, f2, T2)
        m2, n_new = lm.triangulate_with_neighbor(
            m, jnp.asarray(0, jnp.int32), jnp.asarray(1, jnp.int32),
            jnp.asarray(0, jnp.int32), cfg,
        )
        n_new = int(n_new)
        assert n_new > 30, n_new
        pts = np.asarray(m2.pt_pos[np.asarray(m2.pt_valid)])
        # each new point should be near some ground-truth landmark;
        # keypoints sit on marker corners (+-7px), so allow a depth-scaled
        # offset (~7px / fx * z)
        d = np.linalg.norm(
            pts[:, None, :] - scene.points[None, :, :], axis=-1
        ).min(axis=1)
        # tolerance = lateral corner offset (+-7px) + 1px-disparity depth
        # uncertainty z^2/(fx*b) for the 0.4m baseline
        z = pts[:, 2]
        tol = 0.15 + 0.015 * z + z * z / (K[0] * 0.4)
        frac_good = (d < tol).mean()
        assert frac_good > 0.85, f"only {frac_good:.2f} near landmarks"
        # observations registered in both KFs
        assert int((np.asarray(m2.kf_obs[0]) >= 0).sum()) == n_new
        assert int((np.asarray(m2.kf_obs[1]) >= 0).sum()) == n_new


class TestDescriptorMedian:
    def test_min_median_matches_bruteforce(self):
        """update_point_descriptors must reproduce the reference's
        min-median-Hamming pick (MapPoint::ComputeDistinctiveDescriptors,
        src/MapPoint.cc:242-307, median includes the zero self-distance)."""
        r = np.random.default_rng(7)
        kmax, n_feat, pmax = 6, 16, 32
        m = ms.empty_map(kmax, pmax, n_feat)
        n_pts = 10
        # each point observed by 2-5 KFs with random descriptors
        kf_obs = np.full((kmax, n_feat), -1, np.int64)
        kf_desc = r.integers(0, 2**32, (kmax, n_feat, 8), dtype=np.uint32)
        obs_of = {p: [] for p in range(n_pts)}
        slot = np.zeros(kmax, np.int64)
        for p in range(n_pts):
            kfs = r.choice(kmax, size=int(r.integers(2, 6)), replace=False)
            for k in kfs:
                s = slot[k]; slot[k] += 1
                kf_obs[k, s] = p
                obs_of[p].append(kf_desc[k, s])
        m = m._replace(
            kf_obs=jnp.asarray(kf_obs, jnp.int32),
            kf_desc=jnp.asarray(kf_desc),
            kf_valid=jnp.ones(kmax, bool),
            kf_feat_valid=jnp.ones((kmax, n_feat), bool),
            pt_valid=jnp.asarray(np.arange(pmax) < n_pts),
        )
        m2 = lm.update_point_descriptors(m)
        got = np.asarray(m2.pt_desc)[:n_pts]

        def ham(a, b):
            return int(np.bitwise_count(a ^ b).sum())

        for p in range(n_pts):
            descs = obs_of[p]
            n = len(descs)
            med = []
            for i in range(n):
                d = sorted(ham(descs[i], descs[j]) for j in range(n))
                med.append(d[(n - 1) // 2])
            # ties are broken by observation order, which is
            # implementation-defined in the reference too (mObservations is
            # keyed by KeyFrame pointer) — accept any minimal-median pick
            best_med = min(med)
            winners = [descs[i] for i in range(n) if med[i] == best_med]
            assert any((got[p] == wdesc).all() for wdesc in winners), (
                f"pt {p}: picked descriptor does not achieve min median")


class TestReparenting:
    def test_cull_reparents_to_best_covisible(self):
        """After a cull, children attach to their best-covisible candidate
        (KeyFrame::SetBadFlag, src/KeyFrame.cc:480-540), not blindly to the
        grandparent."""
        kmax, n_feat, pmax = 8, 64, 512
        cfg = SlamConfig(sensor="rgbd", max_keyframes=kmax, max_points=pmax,
                         n_features=n_feat)
        m = ms.empty_map(kmax, pmax, n_feat)
        r = np.random.default_rng(0)
        # KF1 = cullable parent; child KF2; grandparent KF0; KF3 strongly
        # covisible with KF2 (should become its parent instead of KF0).
        kf_obs = np.full((kmax, n_feat), -1, np.int64)
        # shared points: KF1's obs fully covered by KF0+KF3 at same octave
        for s in range(40):
            p = s
            kf_obs[1, s] = p          # culled KF sees p
            kf_obs[0, s] = p          # 3 other same-octave observers ->
            kf_obs[3, s] = p          # every point redundant
            kf_obs[2, s] = p
        # KF3<->KF2 extra overlap to dominate KF0<->KF2
        for s in range(40, 60):
            kf_obs[3, s] = s
            kf_obs[2, s] = s
        depth = np.full((kmax, n_feat), 2.0, np.float32)
        uright = np.full((kmax, n_feat), 5.0, np.float32)
        m = m._replace(
            kf_obs=jnp.asarray(kf_obs, jnp.int32),
            kf_valid=jnp.asarray(np.arange(kmax) < 4),
            kf_feat_valid=jnp.ones((kmax, n_feat), bool),
            kf_depth=jnp.asarray(depth),
            kf_uright=jnp.asarray(uright),
            kf_parent=jnp.asarray([-1, 0, 1, 0] + [-1] * (kmax - 4), jnp.int32),
            pt_valid=jnp.asarray(np.arange(pmax) < 64),
        )
        m2 = lm.cull_keyframes(m, jnp.asarray(2), cfg)
        assert not bool(m2.kf_valid[1]), "KF1 should be culled (redundant)"
        # child 2 re-parents to its best covisible candidate; KF3 shares 50
        # points with KF2 vs KF0's 30 -> but candidates start as {parent=0}
        # and grow; KF3 is not a candidate unless it was re-parented itself,
        # so the expected parent is KF0 here.
        assert int(m2.kf_parent[2]) == 0
        # spanning tree stays acyclic and rooted among valid KFs
        par = np.asarray(m2.kf_parent)
        for k in np.where(np.asarray(m2.kf_valid))[0]:
            seen = set()
            while k >= 0:
                assert k not in seen
                seen.add(k)
                k = int(par[k])


class TestFuseTargets:
    """_fuse_targets semantics vs a straightforward reference
    implementation (SearchInNeighbors target set, LocalMapping.cc:454-483)."""

    def test_matches_naive_reference(self):
        import numpy as np
        import jax.numpy as jnp
        from orb_slam2_comment_tpu import constants as C
        from orb_slam2_comment_tpu.models import local_mapping as lm
        from orb_slam2_comment_tpu.models import map_state as ms
        from orb_slam2_comment_tpu.utils.config import SlamConfig

        r = np.random.default_rng(0)
        kmax, N, pmax = 32, 64, 2048
        cfg = SlamConfig(sensor="rgbd", max_keyframes=kmax, max_points=pmax,
                         n_features=600, n_levels=4)
        m = ms.empty_map(kmax, pmax, n_feat=N)
        # chain-structured observations so covisibility decays with
        # keyframe distance (street-like)
        kf_obs = np.full((kmax, N), -1, np.int32)
        for k in range(20):
            kf_obs[k] = k * 24 + r.permutation(96)[:N] % 96 + k * 0
            kf_obs[k] = np.clip(k * 24 + r.integers(0, 96, N), 0, pmax - 1)
        m = m._replace(
            kf_obs=jnp.asarray(kf_obs),
            kf_valid=jnp.asarray(np.arange(kmax) < 20),
            kf_feat_valid=jnp.ones((kmax, N), bool),
            pt_valid=jnp.ones(pmax, bool),
        )
        kf_id = 10
        n_fuse, n_ext = 8, 8
        fbi = np.asarray(lm._fuse_targets(
            m, jnp.asarray(kf_id, jnp.int32), n_fuse, n_ext))

        # naive reference
        def covis_row(k):
            in_k = np.zeros(pmax, bool)
            row = kf_obs[k]
            in_k[row[row >= 0]] = True
            w = np.zeros(kmax, int)
            for j in range(kmax):
                if j == k or not (j < 20):
                    continue
                rj = kf_obs[j]
                w[j] = int(np.sum(in_k[rj[rj >= 0]]))
            return w

        w = covis_row(kf_id)
        order = np.argsort(-w, kind="stable")[:n_fuse]
        first = [int(i) for i in order if w[i] >= C.COVIS_MIN_WEIGHT]
        # first-degree slots must match as a set
        got_first = set(int(x) for x in fbi[:n_fuse] if x >= 0)
        assert got_first == set(first), (got_first, first)
        # second-degree: each first's top-5, minus self/first set
        second = set()
        for f in first:
            wf = covis_row(f)
            o2 = np.argsort(-wf, kind="stable")[:C.SECOND_DEGREE_NEIGHBORS]
            for j in o2:
                if wf[j] >= C.COVIS_MIN_WEIGHT:
                    second.add(int(j))
        second -= set(first) | {kf_id}
        got_ext = set(int(x) for x in fbi[n_fuse:] if x >= 0)
        # the kernel caps at n_ext, ranked by covisibility with kf_id;
        # when everything fits the sets must be equal
        if len(second) <= n_ext:
            assert got_ext == second, (got_ext, second)
        else:
            assert got_ext <= second and len(got_ext) == n_ext
