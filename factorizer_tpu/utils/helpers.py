"""Config-plumbing helpers: the ``partialize`` idiom.

Any module/callable slot in this framework accepts either a callable or a tuple
``(Callable, args_tuple_or_kwargs_dict, ...)`` which is resolved into a
``functools.partial``.  This mirrors the reference library's config idiom
(reference: factorizer/utils/helpers.py:91-147) but is torch-free and generic.
"""

from __future__ import annotations

import inspect
from collections.abc import Mapping
from functools import partial
from itertools import accumulate
from operator import mul
from typing import Any, Callable, Iterable, Sequence

__all__ = [
    "Universaltuple",
    "as_tuple",
    "cumprod",
    "has_args",
    "partialize",
    "is_partializable",
    "to_ntuple",
]


class Universaltuple(tuple):
    """A tuple whose membership test always succeeds.

    Useful as a sentinel for "applies to every index" in per-stage configs.
    """

    def __contains__(self, other: Any) -> bool:  # noqa: D105
        return True


def as_tuple(obj: Any) -> tuple[Any, ...]:
    """Convert ``obj`` to a tuple; strings and scalars become 1-tuples."""
    if not isinstance(obj, Sequence) or isinstance(obj, str):
        return (obj,)
    return tuple(obj)


def to_ntuple(obj: Any, n: int) -> tuple[Any, ...]:
    """Broadcast a scalar to an ``n``-tuple, or validate a length-``n`` sequence."""
    if not isinstance(obj, Sequence) or isinstance(obj, str):
        return (obj,) * n
    t = tuple(obj)
    if len(t) == 1:
        return t * n
    if len(t) != n:
        raise ValueError(f"Expected length-{n} sequence, got {t!r}.")
    return t


def cumprod(x: Iterable[float]) -> list[float]:
    """Cumulative product of an iterable."""
    return list(accumulate(x, mul))


def has_args(obj: Any, keywords: str | Sequence[str]) -> bool:
    """True if callable ``obj`` accepts all of the given keyword arguments."""
    if not callable(obj):
        return False
    try:
        sig = inspect.signature(obj)
    except (ValueError, TypeError):
        return False
    return all(key in sig.parameters for key in as_tuple(keywords))


def partialize(obj: Any) -> Callable:
    """Resolve ``Callable | (Callable, args..., kwargs...)`` into a callable.

    Tuple elements after the callable may be dicts (merged as keyword args) or
    sequences (extended as positional args); any other value is appended as a
    single positional arg.
    """
    if callable(obj):
        return obj

    if isinstance(obj, Sequence) and obj and callable(obj[0]):
        fn = obj[0]
        args: list[Any] = []
        kwargs: dict[str, Any] = {}
        for item in obj[1:]:
            if isinstance(item, Mapping):  # includes flax FrozenDict
                kwargs.update(item)
            elif isinstance(item, Sequence) and not isinstance(item, str):
                args.extend(item)
            else:
                args.append(item)
        return partial(fn, *args, **kwargs)

    raise TypeError(f"Expected a callable or (callable, args...) tuple, got {type(obj).__name__}")


def is_partializable(obj: Any) -> bool:
    """True if ``partialize(obj)`` would succeed."""
    if callable(obj):
        return True
    return bool(isinstance(obj, Sequence) and obj and callable(obj[0]))
