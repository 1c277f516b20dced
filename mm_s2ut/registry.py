"""Task/model/criterion registries.

TPU-native replacement for fairseq's ``@register_task`` /
``@register_model`` / ``@register_criterion`` plugin mechanism that the
reference relies on (reference tasks/speech_to_speech.py:45,
models/mm_s2s_transformer.py:625, criterions/speech_to_speech_criterion.py:33).

Unlike fairseq, registration is explicit and import-driven: importing
``mm_s2ut`` registers everything. Unlike the reference, the criterion
registry is actually wired into the trainer (the reference's
``speech_to_unit_v2`` criterion was dead code — SURVEY.md §1).
"""
from __future__ import annotations

from typing import Any, Callable, Dict

_REGISTRIES: Dict[str, Dict[str, Any]] = {
    "task": {},
    "model": {},
    "criterion": {},
    "arch": {},
    "lr_scheduler": {},
    "vocoder": {},
}


class RegistryError(KeyError):
    pass


def register(kind: str, name: str) -> Callable[[Any], Any]:
    """Decorator: register ``obj`` under ``kind``/``name``."""

    def wrap(obj: Any) -> Any:
        reg = _REGISTRIES[kind]
        if name in reg and reg[name] is not obj:
            raise RegistryError(f"duplicate {kind} registration: {name!r}")
        reg[name] = obj
        return obj

    return wrap


def register_task(name: str):
    return register("task", name)


def register_model(name: str):
    return register("model", name)


def register_criterion(name: str):
    return register("criterion", name)


def register_model_architecture(model_name: str, arch_name: str):
    """Register a named hyperparameter preset for a model, mirroring
    fairseq's ``@register_model_architecture``
    (reference models/mm_s2s_transformer.py:703-710)."""

    def wrap(fn: Callable) -> Callable:
        _REGISTRIES["arch"][arch_name] = (model_name, fn)
        return fn

    return wrap


def get(kind: str, name: str) -> Any:
    try:
        return _REGISTRIES[kind][name]
    except KeyError:
        avail = sorted(_REGISTRIES.get(kind, {}))
        raise RegistryError(
            f"unknown {kind} {name!r}; available: {avail}"
        ) from None


def get_task(name: str) -> Any:
    return get("task", name)


def get_model(name: str) -> Any:
    return get("model", name)


def get_criterion(name: str) -> Any:
    return get("criterion", name)


def get_arch(name: str):
    return get("arch", name)


def available(kind: str):
    return sorted(_REGISTRIES[kind])
