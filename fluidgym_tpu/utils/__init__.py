"""Framework utilities: data distribution, profiling, logging, seeding."""
