"""Pure, vectorized scalar kernels (SURVEY.md §2.2 M1/M14/M15 analogues)."""
