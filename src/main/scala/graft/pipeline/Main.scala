package graft.pipeline

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import graft.GraftSession

/** S19 — CLI entry (aristoteles.py:148-227): `-c/--conf-file`,
  * `--force`, `--reset-state [YYYYMMDD]`, `--stop YYYYMMDD`,
  * `-v/--verbose`; validation errors exit 1, normal paths exit 0.
  * The reset-state range check (2000-01-01..today) mirrors :82-92 —
  * without the reference's `argeparse` NameError bug. */
object Main {
  private val DayFmt = DateTimeFormatter.BASIC_ISO_DATE

  case class Args(
      confFile: String = "",
      force: Boolean = false,
      resetState: Option[Option[LocalDate]] = None,
      stop: Option[LocalDate] = None,
      verbose: Boolean = false)

  def parseArgs(argv: Array[String], today: LocalDate): Either[String, Args] = {
    def parseDay(s: String): Either[String, LocalDate] =
      try {
        val d = LocalDate.parse(s, DayFmt)
        if (d.isBefore(Watermark.DayLimit) || d.isAfter(today))
          Left(s"day $s out of range ${Watermark.DayLimit.format(DayFmt)}..${today.format(DayFmt)}")
        else Right(d)
      } catch { case _: Exception => Left(s"unparsable day: $s") }

    var a = Args()
    var i = 0
    while (i < argv.length) {
      argv(i) match {
        case "-c" | "--conf-file" =>
          if (i + 1 >= argv.length) return Left("missing value for --conf-file")
          a = a.copy(confFile = argv(i + 1)); i += 2
        case "--force" => a = a.copy(force = true); i += 1
        case "-v" | "--verbose" => a = a.copy(verbose = true); i += 1
        case "--stop" =>
          if (i + 1 >= argv.length) return Left("missing value for --stop")
          parseDay(argv(i + 1)) match {
            case Left(e) => return Left(e)
            case Right(d) => a = a.copy(stop = Some(d)); i += 2
          }
        case "--reset-state" =>
          if (i + 1 < argv.length && !argv(i + 1).startsWith("-"))
            parseDay(argv(i + 1)) match {
              case Left(e) => return Left(e)
              case Right(d) => a = a.copy(resetState = Some(Some(d))); i += 2
            }
          else { a = a.copy(resetState = Some(None)); i += 1 }
        case other => return Left(s"unknown argument: $other")
      }
    }
    if (a.confFile.isEmpty) Left("required: -c/--conf-file") else Right(a)
  }

  def main(argv: Array[String]): Unit = {
    val today = LocalDate.now(java.time.ZoneOffset.UTC)
    parseArgs(argv, today) match {
      case Left(err) =>
        System.err.println(s"error: $err")
        sys.exit(1)
      case Right(args) =>
        val cfg = try IniConfig.load(args.confFile) catch {
          case e: IniConfig.ParseError =>
            System.err.println(s"config error: ${e.msg}"); sys.exit(1); return
          case e: java.io.IOException => // missing/unreadable conf file
            System.err.println(s"config error: cannot read ${args.confFile}: $e")
            sys.exit(1); return
        }
        val spark = GraftSession.local("aristoteles-spark")
        try {
          args.resetState match {
            case Some(requested) =>
              val init = ArchiveJob.resetState(spark, cfg, requested, args.force)
              if (args.verbose) println(s"state initialized to $init")
            case None =>
              val res = ArchiveJob.run(spark, cfg, today,
                force = args.force, stopDay = args.stop)
              if (args.verbose) println(
                s"status=${res.status} daysWritten=${res.daysWritten} yesterday=${res.yesterday}")
              if (res.status == 3) sys.exit(1)
          }
        } finally spark.stop()
    }
  }
}
