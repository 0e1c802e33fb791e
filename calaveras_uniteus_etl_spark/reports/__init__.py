"""Report library: the reference's ~45-endpoint analytics surface
re-expressed as DataFrame-returning functions + collect-side formatters."""
