"""CDC / upsert / lakehouse-table queries (SURVEY.md §2.9) — filled in
milestones M2-M4."""
