"""A faithful stand-in for the optuna API surface ptyrad_tpu uses.

optuna is not installable in this environment (no network), so the optuna
branches of engine/hypertune.py (sampler/pruner construction by name,
sqlite storage URL, trial.suggest_*, trial.report/should_prune,
study.optimize(catch=...), best_trial) are exercised against this double.

Semantics mirrored from optuna 3.x — the parts that matter for the
integration contract:
  * ``study.optimize`` catches ONLY ``TrialPruned`` and the exception types
    in ``catch``; anything else ABORTS the study and propagates (this is the
    reference's one-bad-trial-kills-the-study bug, reconstruction.py:234 —
    the behavior run_hypertune's catch=(FloatingPointError,) must defend
    against).
  * ``study.best_trial`` raises ``ValueError`` when no trial completed.
  * ``create_study(..., load_if_exists=True)`` returns the existing study
    for the same (storage, study_name); ``False`` raises DuplicatedStudyError.
  * suggest_* record into ``trial.params`` and respect step/log kwargs.
"""

from __future__ import annotations

import math
import random as _random
import statistics
import types


class TrialPruned(Exception):
    pass


class DuplicatedStudyError(Exception):
    pass


class FrozenTrial:
    def __init__(self, number):
        self.number = number
        self.params = {}
        self.value = None
        self.state = "RUNNING"
        self.intermediate_values = {}


class Trial:
    def __init__(self, study, number):
        self.study = study
        self.number = number
        self.params = {}
        self._reports = {}

    def _record(self, name, v):
        self.params[name] = v
        return v

    def suggest_float(self, name, low, high, *, step=None, log=False):
        r = self.study._rng.random()
        if log:
            v = math.exp(math.log(low) + r * (math.log(high) - math.log(low)))
        else:
            v = low + r * (high - low)
            if step is not None:
                v = low + round((v - low) / step) * step
                v = min(max(v, low), high)
        return self._record(name, float(v))

    def suggest_int(self, name, low, high, *, step=1, log=False):
        n = (high - low) // step
        return self._record(name, int(low + self.study._rng.randint(0, n) * step))

    def suggest_categorical(self, name, choices):
        return self._record(name, self.study._rng.choice(list(choices)))

    def report(self, value, step):
        self._reports[int(step)] = float(value)

    def should_prune(self):
        pruner = self.study.pruner
        return bool(pruner and pruner._prune(self.study, self))


class _Sampler:
    def __init__(self, **kwargs):
        self.seed = kwargs.get("seed")


class TPESampler(_Sampler):
    pass


class RandomSampler(_Sampler):
    pass


class GridSampler(_Sampler):
    def __init__(self, search_space=None, **kwargs):
        super().__init__(**kwargs)
        self.search_space = search_space


class MedianPruner:
    def __init__(self, n_startup_trials=5, n_warmup_steps=0, **kwargs):
        self.n_startup_trials = n_startup_trials
        self.n_warmup_steps = n_warmup_steps

    def _prune(self, study, trial):
        if not trial._reports:
            return False
        step = max(trial._reports)
        if step <= self.n_warmup_steps:
            return False
        hist = [
            t.intermediate_values[step]
            for t in study._trials
            if t.state in ("COMPLETE", "PRUNED") and step in t.intermediate_values
        ]
        if len(hist) < self.n_startup_trials:
            return False
        return trial._reports[step] > statistics.median(hist)


class HyperbandPruner(MedianPruner):
    pass


class NopPruner:
    def _prune(self, study, trial):
        return False


class Study:
    def __init__(self, study_name, storage, sampler=None, pruner=None,
                 direction="minimize"):
        self.study_name = study_name
        self.storage = storage
        self.sampler = sampler
        self.pruner = pruner
        self.direction = direction
        self._rng = _random.Random(getattr(sampler, "seed", None))
        self._trials = []

    def optimize(self, func, n_trials=None, timeout=None, catch=()):
        for _ in range(int(n_trials or 0)):
            trial = Trial(self, len(self._trials))
            frozen = FrozenTrial(trial.number)
            self._trials.append(frozen)
            try:
                value = func(trial)
            except TrialPruned:
                frozen.state = "PRUNED"
                frozen.value = (
                    trial._reports[max(trial._reports)] if trial._reports else None
                )
            except catch:
                frozen.state = "FAIL"
            else:
                frozen.state = "COMPLETE"
                frozen.value = float(value)
            finally:
                frozen.params = dict(trial.params)
                frozen.intermediate_values = dict(trial._reports)
            # any exception NOT in catch/TrialPruned propagated above,
            # aborting the loop — exactly optuna's behavior

    @property
    def trials(self):
        return list(self._trials)

    @property
    def best_trial(self):
        done = [t for t in self._trials if t.state == "COMPLETE" and t.value is not None]
        if not done:
            raise ValueError("Record does not exist (no completed trials).")
        sign = -1.0 if self.direction == "maximize" else 1.0
        return min(done, key=lambda t: sign * t.value)


_STUDIES = {}


def create_study(study_name="no-name", storage=None, sampler=None, pruner=None,
                 direction="minimize", load_if_exists=False):
    key = (storage, study_name)
    if key in _STUDIES:
        if not load_if_exists:
            raise DuplicatedStudyError(study_name)
        return _STUDIES[key]
    study = Study(study_name, storage, sampler, pruner, direction)
    if storage is not None:
        _STUDIES[key] = study
    return study


def make_module():
    """Assemble an importable module tree mirroring `optuna`."""
    mod = types.ModuleType("optuna")
    mod.create_study = create_study
    mod.Study = Study
    mod.Trial = Trial

    samplers = types.ModuleType("optuna.samplers")
    samplers.TPESampler = TPESampler
    samplers.RandomSampler = RandomSampler
    samplers.GridSampler = GridSampler
    mod.samplers = samplers

    pruners = types.ModuleType("optuna.pruners")
    pruners.MedianPruner = MedianPruner
    pruners.HyperbandPruner = HyperbandPruner
    pruners.NopPruner = NopPruner
    mod.pruners = pruners

    exceptions = types.ModuleType("optuna.exceptions")
    exceptions.TrialPruned = TrialPruned
    exceptions.DuplicatedStudyError = DuplicatedStudyError
    mod.exceptions = exceptions
    return mod
