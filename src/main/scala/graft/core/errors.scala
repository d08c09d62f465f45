package graft.core

/** Exception types mirroring the Python exceptions the reference raises,
  * with the exact pandas-compatible message texts (SURVEY.md §5 item 3;
  * reference README.md:53-60 "exception-to-exception compatibility"). */
class GraftValueError(msg: String) extends IllegalArgumentException(msg)
class GraftTypeError(msg: String) extends IllegalArgumentException(msg)
class GraftIndexError(msg: String) extends IndexOutOfBoundsException(msg)
class GraftKeyError(msg: String) extends NoSuchElementException(msg)
class GraftNotImplementedError(msg: String = "") extends UnsupportedOperationException(msg)
