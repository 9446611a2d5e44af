"""Placeholder — populated in build order (see SURVEY.md §7.2)."""
