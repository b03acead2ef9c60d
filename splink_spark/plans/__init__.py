"""Plan orchestration: the Linker API and resumable stage manager."""
