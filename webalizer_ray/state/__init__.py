"""Checkpoint / resume state management (SURVEY.md §4.3; S11/W5 analogs)."""
