"""Source layer: file readers (S1-S5), mapping-driven projection
(P1-P3), and the validation operators V1-V4 (SURVEY.md §2.1-2.2,
§2.11)."""
