"""Pallas TPU kernels for the hot compute paths."""

from .grain_pallas import TILE_H, film_grain_pallas

__all__ = ["TILE_H", "film_grain_pallas"]
