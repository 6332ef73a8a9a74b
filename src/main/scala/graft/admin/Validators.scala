package graft.admin

/** Input validators of the reference's interactive layer
  * (ui/interact.py:8-46), as pure predicates returning either the
  * canonical error message or acceptance — table-driven-testable and
  * reusable by any front end. */
object Validators {

  private val LowerName = "^[a-z][a-z0-9_]*[a-z0-9]$".r
  private val UpperName = "^[A-Z][A-Z0-9_]*[A-Z0-9]$".r

  val NameError: String =
    "The value can only contain lowercase, digits and underscores, " +
      "must start with a character and not end with underscore"

  val DatasetError: String =
    "The value can only contain lowercase, digits, and underscores, and " +
      "must start with a letter. INFORMATION_SCHEMA is allowed."

  val UpperTableError: String =
    "The table can only contain uppercase, digits and underscores, must " +
      "start with a character and not end with underscore."

  val LowerTableError: String =
    "The value can only contain lowercase letters, digits, and underscores, " +
      "starting with a lowercase letter and not ending with an underscore."

  val DescriptionError: String = "The description must not start with a space"

  /** name_validator (interact.py:8-14). */
  def validateName(s: String): Either[String, Unit] =
    if (LowerName.matches(s)) Right(()) else Left(NameError)

  /** dataset_name_validator (interact.py:17-25): INFORMATION_SCHEMA is the
    * one uppercase exception. */
  def validateDatasetName(s: String): Either[String, Unit] =
    if (s == "INFORMATION_SCHEMA" || LowerName.matches(s)) Right(())
    else Left(DatasetError)

  /** table_name_validator (interact.py:28-40): INFORMATION_SCHEMA views
    * are uppercase, everything else lowercase. */
  def validateTableName(datasetName: String)(s: String): Either[String, Unit] =
    if (datasetName == "INFORMATION_SCHEMA")
      if (UpperName.matches(s)) Right(()) else Left(UpperTableError)
    else if (LowerName.matches(s)) Right(())
    else Left(LowerTableError)

  /** description_validator (interact.py:43-46): must start with
    * non-whitespace. */
  def validateDescription(s: String): Either[String, Unit] =
    if (s.nonEmpty && !s.head.isWhitespace) Right(()) else Left(DescriptionError)
}
