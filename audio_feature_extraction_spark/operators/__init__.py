"""Engine operators. Each module maps to a SURVEY.md §2 operator family."""
