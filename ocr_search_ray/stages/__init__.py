"""Ray Data batch transforms: plain functions for stateless stages, callable
classes (actor pools) for stateful ones (SURVEY.md §7.3)."""
