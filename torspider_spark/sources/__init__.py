"""Sources & sinks: synthetic corpus, snapshot warehouse, driver testdata."""
