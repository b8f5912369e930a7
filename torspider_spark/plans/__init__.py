"""Executable plans: the crawl epoch loop, stats queries, the simulator."""
