"""Timed values and time-locked state (reference openzl-util/src/time/lock.rs).

`Timed` pairs a value with its creation instant; `TimeLock` gates mutation
behind a minimum age — the reference uses this for rate-limited ceremony
state transitions."""

from __future__ import annotations

import dataclasses
import time
from typing import Generic, Optional, TypeVar

T = TypeVar("T")


@dataclasses.dataclass
class Timed(Generic[T]):
    value: T
    instant: float = dataclasses.field(default_factory=time.monotonic)

    def elapsed(self) -> float:
        return time.monotonic() - self.instant

    def refresh(self, value: T) -> None:
        self.value = value
        self.instant = time.monotonic()


class TimeLock(Generic[T]):
    """Value that can only be replaced after `min_age` seconds."""

    def __init__(self, value: T, min_age: float):
        self._timed = Timed(value)
        self.min_age = min_age

    @property
    def value(self) -> T:
        return self._timed.value

    def try_set(self, value: T) -> bool:
        if self._timed.elapsed() < self.min_age:
            return False
        self._timed.refresh(value)
        return True
