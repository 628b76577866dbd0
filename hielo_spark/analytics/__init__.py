"""Table-health analytics (SURVEY §2.4 A1-A12) over snapshot frames."""
