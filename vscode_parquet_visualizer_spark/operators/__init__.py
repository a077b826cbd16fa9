"""Engine-constructed operators (SURVEY.md §2A) and pipeline extensions."""
