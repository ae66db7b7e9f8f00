"""The --train loop: optimization + FrameStats emission + checkpoint
save/restore roundtrip (wires tracing.py and checkpoint.py into a real
workflow; VERDICT r1 weak #5)."""

import json
import os

import numpy as np
import pytest


def test_train_checkpoint_roundtrip(tmp_path, capfd):
    from raytracer_tpu import checkpoint, cli

    ckpt = str(tmp_path / "ckpt.npz")
    args = ["--config", "/root/reference/world1.json",
            "--width", "48", "--height", "32",
            "--reference-impl", "--no-bvh",
            "--train", "2", "--checkpoint", ckpt, "--lr", "0.05",
            "--checkpoint-every", "1"]
    assert cli.main(args) == 0
    assert os.path.exists(ckpt)

    err = capfd.readouterr().err
    steps = [json.loads(l) for l in err.splitlines()
             if l.startswith("{") and '"train_step"' in l]
    frames = [json.loads(l) for l in err.splitlines()
              if l.startswith("{") and '"frame"' in l]
    assert len(steps) == 2 and len(frames) == 2
    assert steps[1]["loss"] < steps[0]["loss"]
    losses_run1 = [s["loss"] for s in steps]

    # resume: starts at step 2 with the optimized params (lower loss than a
    # fresh start) and continues the step counter
    assert cli.main(args) == 0
    err = capfd.readouterr().err
    steps2 = [json.loads(l) for l in err.splitlines()
              if l.startswith("{") and '"train_step"' in l]
    restored = [json.loads(l) for l in err.splitlines()
                if l.startswith("{") and '"checkpoint_restored"' in l]
    assert len(restored) == 1 and restored[0]["step"] == 2
    assert steps2[0]["step"] == 2
    assert steps2[0]["loss"] < losses_run1[0]


def test_checkpoint_rejects_mismatched_structure(tmp_path):
    from raytracer_tpu import checkpoint

    path = str(tmp_path / "c.npz")
    tree = {"a": np.zeros((2, 3)), "b": np.ones((4,))}
    checkpoint.save(path, tree, step=5)
    got, step = checkpoint.load(path, tree)
    assert step == 5
    np.testing.assert_array_equal(got["a"], tree["a"])

    with pytest.raises(ValueError):
        checkpoint.load(path, {"a": np.zeros((2, 3))})
    with pytest.raises(ValueError):
        checkpoint.load(path, {"a": np.zeros((9, 9)), "b": np.ones((4,))})


class TestElasticRecovery:
    """Failure detection + elastic recovery (SURVEY §5, the one 'partial'
    inventory row through round 3): the supervisor must detect a worker
    crash AND a worker hang, restart from the last checkpoint, and converge
    to EXACTLY the state an uninterrupted run produces (training is pure, so
    recomputed steps are bit-identical)."""

    WORLD = ["--config", "/root/reference/world1.json",
             "--width", "48", "--height", "32",
             "--reference-impl", "--no-bvh",
             "--checkpoint-every", "1", "--lr", "0.05"]

    def _params(self, ckpt):
        import numpy as np

        data = np.load(ckpt, allow_pickle=True)
        return {k: data[k] for k in data.files if k.startswith("arr_")}, \
            int(data["__step__"])

    def _run_clean(self, tmp_path, steps=4):
        from raytracer_tpu import cli

        ckpt = str(tmp_path / "clean.npz")
        assert cli.main(self.WORLD + ["--train-until", str(steps),
                                      "--checkpoint", ckpt]) == 0
        return self._params(ckpt)

    def test_crash_recovery_matches_uninterrupted(self, tmp_path, capfd):
        import os

        from raytracer_tpu import cli

        want, want_step = self._run_clean(tmp_path)
        capfd.readouterr()

        ckpt = str(tmp_path / "elastic.npz")
        os.environ["RT_FAULT_AT_STEP"] = "2"
        os.environ["RT_FAULT_MARKER"] = str(tmp_path / "crashed.marker")
        try:
            rc = cli.main(self.WORLD + ["--train-until", "4",
                                        "--checkpoint", ckpt,
                                        "--elastic", "2",
                                        "--hang-timeout", "300"])
        finally:
            del os.environ["RT_FAULT_AT_STEP"], os.environ["RT_FAULT_MARKER"]
        assert rc == 0
        assert os.path.exists(str(tmp_path / "crashed.marker"))
        err = capfd.readouterr().err
        assert '"elastic_failure"' in err and "crash rc=13" in err
        assert '"elastic_restart"' in err and '"elastic_done"' in err

        got, got_step = self._params(ckpt)
        assert got_step == want_step == 4
        import numpy as np

        for k in want:
            np.testing.assert_array_equal(got[k], want[k])

    def test_hang_detection_and_recovery(self, tmp_path, capfd):
        import os

        from raytracer_tpu import cli

        want, _ = self._run_clean(tmp_path)
        capfd.readouterr()

        ckpt = str(tmp_path / "hung.npz")
        os.environ["RT_HANG_AT_STEP"] = "1"
        os.environ["RT_FAULT_MARKER"] = str(tmp_path / "hung.marker")
        try:
            # worker heartbeats every step; a 20 s silence => hang verdict
            rc = cli.main(self.WORLD + ["--train-until", "3",
                                        "--checkpoint", ckpt,
                                        "--elastic", "1",
                                        "--hang-timeout", "20"])
        finally:
            del os.environ["RT_HANG_AT_STEP"], os.environ["RT_FAULT_MARKER"]
        assert rc == 0
        err = capfd.readouterr().err
        assert '"elastic_failure", "kind": "hang"' in err
        _, got_step = self._params(ckpt)
        assert got_step == 3

    def test_restart_budget_exhaustion_surfaces(self, tmp_path, capfd):
        """A PERSISTENT failure must fail loudly once the restart budget is
        spent, not spin: checkpoint storage pointed at a nonexistent
        directory makes every attempt crash at its first save (and leaves
        no durable progress to resume)."""
        from raytracer_tpu import cli

        ckpt = str(tmp_path / "no_dir" / "loop.npz")
        rc = cli.main(self.WORLD + ["--train-until", "3",
                                    "--checkpoint", ckpt,
                                    "--elastic", "1",
                                    "--hang-timeout", "300"])
        assert rc == 1
        err = capfd.readouterr().err
        assert err.count('"elastic_failure"') == 2  # initial + 1 restart
        assert '"elastic_gave_up"' in err
