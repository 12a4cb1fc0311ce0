"""Job plans: crawl round loop, upload transforms, analysis queries."""
