package graft.pipeline

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** S15 — incremental high-watermark state (aristoteles.py:65-79, :476).
  *
  * Semantics preserved exactly:
  *  - the stored value is the *next* day to process (:65-68 writes
  *    day+1);
  *  - unparsable/absent state reads as None (:71-79);
  *  - earliest representable day is 2000-01-01 (:62);
  *  - the write happens only after a day's output commits (:474-476),
  *    so a crash between sink-commit and state-advance causes a
  *    harmless idempotent rewrite, never a skip.
  *
  * The write is atomic (tmp + rename) like the reference's metrics file
  * (:141-142) — the reference's plain open("w") state write is a
  * documented-and-fixed weakness, not replicated.
  */
object Watermark {
  private val Fmt = DateTimeFormatter.BASIC_ISO_DATE // YYYYMMDD
  val DayLimit: LocalDate = LocalDate.of(2000, 1, 1)

  /** Read the next-day-to-process; None on missing/corrupt state. */
  def read(path: String): Option[LocalDate] =
    try {
      val txt = Files.readString(Paths.get(path)).trim
      val d = LocalDate.parse(txt, Fmt)
      if (d.isBefore(DayLimit)) None else Some(d)
    } catch { case _: Exception => None }

  /** Record `processedDay` as done: store processedDay+1 atomically. */
  def advance(path: String, processedDay: LocalDate): Unit =
    writeNext(path, processedDay.plusDays(1))

  def writeNext(path: String, nextDay: LocalDate): Unit = {
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    val tmp: Path = Paths.get(path + ".new")
    Files.writeString(tmp, nextDay.format(Fmt))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** S7 — clamp a requested reset day up to the earliest available day
    * (aristoteles.py:256-259) and the 2000-01-01 floor (:62, :82-92). */
  def clamp(requested: LocalDate, firstAvailable: LocalDate): LocalDate = {
    val floored = if (requested.isBefore(DayLimit)) DayLimit else requested
    if (floored.isBefore(firstAvailable)) firstAvailable else floored
  }
}
