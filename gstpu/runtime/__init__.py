"""Runtime: cooperative scheduler + batched device executor (L2')."""
