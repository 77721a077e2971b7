"""Source readers: format-sniffed scans + recursive JSON flattening."""
