"""S8: REST serving surface over the Spark extraction battery."""
