"""Sigma-transition schedules: per-step CFG/strength ramps.

Re-derivation of the pure scheduling math behind the reference's
sigma-scheduled guiders (``CustomLTXNodes.py:20-127``) in numpy — the
``CFGGuider`` subclasses themselves wrap ComfyUI's sampler and stay out
of scope (SURVEY.md section 2.5); these functions are the part a
TPU-side sampler loop consumes as a plain per-transition value table.

A "transition" is the interval between consecutive sigmas: ``N`` sigmas
give ``N - 1`` transitions, and the active window is expressed in
percentages of the transition count.
"""

from __future__ import annotations

import numpy as np

INTERPOLATIONS = ("linear", "ease_in", "ease_out")


def _as_sigmas(sigmas) -> np.ndarray:
    array = np.asarray(sigmas, np.float64).reshape(-1)
    if array.size < 2:
        raise ValueError("sigmas must contain at least two values")
    if not np.isfinite(array).all():
        raise ValueError("every sigma value must be finite")
    return array


def interpolation_factor(interpolation: str, amount: float) -> float:
    """Ramp shaping (``CustomLTXNodes.py:33-40``): linear, quadratic
    ease-in, or quadratic ease-out."""
    if interpolation == "linear":
        return float(amount)
    if interpolation == "ease_in":
        return float(amount * amount)
    if interpolation == "ease_out":
        return float(amount * (2.0 - amount))
    raise ValueError(f"Unsupported interpolation: {interpolation}")


def build_transition_values(sigmas, value_start: float, value_end: float,
                            interpolation: str = "linear",
                            start_percent: float = 0.0,
                            end_percent: float = 1.0, *,
                            outside_value: float | None = None
                            ) -> tuple[np.ndarray, tuple[float, ...]]:
    """One scheduled value per sigma transition
    (``CustomLTXNodes.py:44-83``).

    With ``outside_value=None`` the start value holds before the ramp
    and the end value after it; otherwise the neutral ``outside_value``
    fills everything outside the ``[start_percent, end_percent]``
    window.  Ramp values are rounded to 4 decimals like the reference.
    Returns ``(sigmas_f64, values)``.
    """
    sigma_array = _as_sigmas(sigmas)
    if start_percent > end_percent:
        raise ValueError(
            "start_percent must be less than or equal to end_percent")
    transitions = sigma_array.size - 1
    start_index = min(int(transitions * start_percent), transitions - 1)
    end_index = min(int(transitions * end_percent), transitions - 1)

    if outside_value is None:
        values = [float(value_start)] * transitions
        for index in range(end_index + 1, transitions):
            values[index] = float(value_end)
    else:
        values = [float(outside_value)] * transitions

    for index in range(start_index, end_index + 1):
        amount = 0.0 if end_index == start_index else \
            (index - start_index) / (end_index - start_index)
        factor = interpolation_factor(interpolation, amount)
        values[index] = round(
            float(value_start + factor * (value_end - value_start)), 4)
    return sigma_array, tuple(values)


def runtime_schedule_offset(expected_sigmas, runtime_sigmas) -> int:
    """Locate the sampler's (possibly truncated) sigma range inside the
    full expected schedule (``CustomLTXNodes.py:86-99``); raises when the
    runtime range is not a contiguous slice of it."""
    expected = _as_sigmas(expected_sigmas)
    runtime = _as_sigmas(runtime_sigmas)
    if runtime.size <= expected.size:
        for offset in range(expected.size - runtime.size + 1):
            window = expected[offset:offset + runtime.size]
            if np.allclose(runtime, window, rtol=1e-5, atol=1e-7):
                return offset
    raise ValueError(
        "The sampler's sigma range is not part of the expected schedule. "
        "Pass the same sigmas to the schedule and the sampler.")


def current_transition_index(sample_sigmas, timestep) -> int:
    """Which transition a live sampler timestep falls in
    (``CustomLTXNodes.py:102-121``): exact sigma match first, then the
    bracketing interval, then nearest."""
    sigmas = _as_sigmas(sample_sigmas)
    current = float(np.asarray(timestep, np.float64).reshape(-1)[0])
    left_edges = sigmas[:-1]

    exact = np.nonzero(np.isclose(left_edges, current,
                                  rtol=1e-5, atol=1e-7))[0]
    if exact.size:
        return int(exact[0])
    for index in range(sigmas.size - 1):
        lo = min(sigmas[index], sigmas[index + 1])
        hi = max(sigmas[index], sigmas[index + 1])
        if lo <= current <= hi:
            return index
    return int(np.argmin(np.abs(left_edges - current)))


def schedule_index(expected_sigmas, runtime_sigmas, timestep) -> int:
    """Index into the full schedule for a live timestep of a (possibly
    truncated) runtime sigma range (``CustomLTXNodes.py:124-127``)."""
    return runtime_schedule_offset(expected_sigmas, runtime_sigmas) \
        + current_transition_index(runtime_sigmas, timestep)
