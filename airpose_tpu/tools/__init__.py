"""Dataset creation & calibration tooling (reference L7 — SURVEY.md §2.11)."""
