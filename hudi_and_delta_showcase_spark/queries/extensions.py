"""North-star extension queries (SURVEY.md §2.12): dedup, similarity
search, text analysis — filled in milestone M6."""
