"""HPO: samplers, ASHA pruner, study lifecycle + journal resume."""

import numpy as np
import pytest

from miseg_tpu.hpo import (RandomSampler, SuccessiveHalvingPruner, TPESampler,
                           TrialPruned, create_study)


def test_study_optimize_finds_optimum(tmp_path):
    study = create_study(storage=str(tmp_path / "j.jsonl"),
                         sampler=TPESampler(seed=0, n_startup_trials=5))

    def objective(trial):
        x = trial.suggest_float("x", -5, 5)
        c = trial.suggest_categorical("c", ["a", "b"])
        return -(x - 2.0) ** 2 + (1.0 if c == "b" else 0.0)

    study.optimize(objective, n_trials=40)
    best = study.best_trial
    assert best.value > -1.0
    assert abs(best.params["x"] - 2.0) < 1.5


def test_tpe_beats_random_on_average():
    def run(sampler):
        study = create_study(sampler=sampler)
        study.optimize(lambda t: -(t.suggest_float("x", 0, 10) - 7) ** 2,
                       n_trials=30)
        return study.best_trial.value

    tpe = run(TPESampler(seed=1, n_startup_trials=8))
    assert tpe > -4.0  # converges near x=7


def test_log_scale_suggestion():
    study = create_study(sampler=RandomSampler(seed=0))
    t = study.ask()
    vals = [t.suggest_float(f"lr{i}", 1e-5, 1e-1, log=True) for i in range(50)]
    assert all(1e-5 <= v <= 1e-1 for v in vals)
    # log-uniform: median far below the arithmetic midpoint
    assert np.median(vals) < 5e-2


def test_int_and_categorical_types():
    study = create_study()
    t = study.ask()
    assert isinstance(t.suggest_int("n", 2, 5), int)
    assert t.suggest_categorical("c", [8, 16]) in (8, 16)
    # repeated suggest returns the same cached value
    assert t.suggest_int("n", 2, 5) == t.params["n"]


def test_tpe_categorical_keeps_exploring_dominated_choice():
    """Candidates are DRAWN from the smoothed good distribution (not
    argmax over all categories), so a dominated category is still
    occasionally proposed after startup — Optuna semantics."""
    from miseg_tpu.hpo.samplers import TPESampler, _Dist
    dist = _Dist("categorical", choices=["good", "bad"])
    # 20 completed trials: "good" always wins, "bad" always loses
    history = ([({"c": "good"}, 1.0)] * 10) + ([({"c": "bad"}, 0.0)] * 10)
    sampler = TPESampler(seed=0, n_startup_trials=5, n_candidates=8)
    draws = [sampler.sample("c", dist, history) for _ in range(300)]
    n_bad = sum(d == "bad" for d in draws)
    assert n_bad > 0, "dominated category locked out permanently"
    assert n_bad < 150, "sampler ignores the good/bad split"


def test_tpe_float_candidates_concentrate_near_good_region():
    """Float candidates come from the good-KDE mixture l(x), so proposals
    cluster near observed good points rather than uniformly."""
    from miseg_tpu.hpo.samplers import TPESampler, _Dist
    rng = np.random.default_rng(0)
    dist = _Dist("float", low=0.0, high=100.0)
    history = [({"x": float(7 + rng.normal(0, 0.5))}, 1.0) for _ in range(8)]
    history += [({"x": float(rng.uniform(20, 100))}, 0.0) for _ in range(24)]
    sampler = TPESampler(seed=1, n_startup_trials=5)
    draws = [sampler.sample("x", dist, history) for _ in range(30)]
    assert np.median(np.abs(np.asarray(draws) - 7.0)) < 10.0


def test_asha_pruner_prunes_bad_trials():
    pruner = SuccessiveHalvingPruner(min_resource=2, reduction_factor=2)
    study = create_study(pruner=pruner)

    # seed history: several good trials reporting high values
    for q in (0.9, 0.8, 0.85):
        t = study.ask()
        for step in range(4):
            t.report(q, step)
        study.tell(t, q)

    bad = study.ask()
    bad.report(0.1, 0)
    assert not bad.should_prune()  # below min_resource
    bad.report(0.1, 1)
    assert bad.should_prune()      # rung 0 reached, bottom of the pack

    good = study.ask()
    good.report(0.95, 0)
    good.report(0.95, 1)
    assert not good.should_prune()


def test_journal_resume(tmp_path):
    path = str(tmp_path / "journal.jsonl")
    s1 = create_study(storage=path)
    t = s1.ask()
    t.suggest_float("x", 0, 1)
    t.report(0.5, 0)
    s1.tell(t, 0.5)

    s2 = create_study(storage=path, load_if_exists=True)
    assert len(s2.trials) == 1
    assert s2.trials[0].value == 0.5
    assert "x" in s2.trials[0].params
    assert s2.trials[0].intermediate == {0: 0.5}


def test_pruned_trials_recorded(tmp_path):
    study = create_study(storage=str(tmp_path / "j.jsonl"))

    def objective(trial):
        trial.suggest_float("x", 0, 1)
        raise TrialPruned()

    study.optimize(objective, n_trials=3)
    assert all(t.state == "pruned" for t in study.trials)
    assert study.best_trial is None


def test_direction_persisted_in_journal(tmp_path):
    """Journal readers (dashboard, default-opened resumes) adopt the
    creator's direction; pruned values and intermediates stay in raw units."""
    from miseg_tpu.hpo import create_study

    storage = str(tmp_path / "j.jsonl")
    study = create_study(storage=storage, direction="minimize")

    def objective(t):
        x = t.suggest_float("x", 0.1, 1.0)
        for step in range(3):
            t.report(10.0 + x - step, step)
        return 10.0 + x

    study.optimize(objective, n_trials=3)
    best_value = study.best_trial.value

    # a reader opening with the DEFAULT direction adopts minimize
    reader = create_study(storage=storage)
    assert reader.direction == "minimize"
    assert reader.best_trial.value == best_value
    assert reader.best_trial.value == min(
        t.value for t in reader.trials if t.value is not None)

    from miseg_tpu.cli.dashboard import study_report
    rep = study_report(storage)
    assert rep["direction"] == "minimize"
    # intermediates reported in raw units (positive losses, not negated)
    vals = [v for t in rep["trials"] for _, v in t["intermediate"]]
    assert all(v > 0 for v in vals)
