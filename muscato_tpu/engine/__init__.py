"""End-to-end matching engine: index build, pipeline, report, driver."""
